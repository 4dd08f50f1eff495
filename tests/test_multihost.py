"""Multi-host data parallelism: 2 processes x 2 CPU devices vs single-process
4 devices must produce the identical global batch and equivalent step results
(SURVEY.md §5.8; reference equivalent: main.py:732 DataParallel at pod scale).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(local_devices):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU relay in workers
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices} "
        "--xla_cpu_collective_call_terminate_timeout_seconds=300")
    env["PYTHONPATH"] = REPO
    return env


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from mla_tpu.data import synthetic
    root = str(tmp_path_factory.mktemp("mh_cre"))
    synthetic.make_cremad(root, n_train=6, n_test=2, spec_shape=(64, 80))
    return root


@pytest.mark.slow
def test_two_process_dp_matches_single_process(fixture_root, tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, outs[i], fixture_root, "2", str(i),
         str(port)],
        env=_env(2), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    single_out = str(tmp_path / "single.json")
    p = subprocess.run(
        [sys.executable, WORKER, single_out, fixture_root, "1", "0", "-"],
        env=_env(4), cwd=REPO, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, (p.stdout + p.stderr)[-3000:]

    w0, w1 = (json.load(open(o)) for o in outs)
    single = json.load(open(single_out))
    # both processes observed the same global batch, equal to single-process
    assert w0["batch_sha"] == w1["batch_sha"] == single["batch_sha"]
    # one DP step is equivalent (cross-process psum may round differently)
    np.testing.assert_allclose(w0["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(w0["params_checksum"],
                               single["params_checksum"], rtol=1e-5)
    np.testing.assert_allclose(w0["head_kernel"], single["head_kernel"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(w0["head_kernel"], w1["head_kernel"],
                               rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def mvsa_root(tmp_path_factory):
    from mla_tpu.data import synthetic
    root = str(tmp_path_factory.mktemp("mh_mvsa"))
    synthetic.make_m3ae(root, dataset="MVSA", n_train=6, n_test=2,
                        img_hw=(48, 64))
    return root


@pytest.mark.slow
def test_two_process_tp_matches_single_process(mvsa_root, tmp_path):
    """Multi-host x TP (the combination the round-2 review found broken):
    2 processes x 2 devices on a (2, 2) mesh with Megatron shardings must
    load batches via deduped host row-blocks, step, and save/restore a
    model-sharded checkpoint — matching the single-process (2, 2) run."""
    port = _free_port()
    outs = [str(tmp_path / f"tpw{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, outs[i], mvsa_root, "2", str(i),
         str(port), "tp"],
        env=_env(2), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    single_out = str(tmp_path / "tpsingle.json")
    p = subprocess.run(
        [sys.executable, WORKER, single_out, mvsa_root, "1", "0", "-", "tp"],
        env=_env(4), cwd=REPO, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, (p.stdout + p.stderr)[-3000:]

    w0, w1 = (json.load(open(o)) for o in outs)
    single = json.load(open(single_out))
    assert w0["batch_sha"] == w1["batch_sha"] == single["batch_sha"]
    np.testing.assert_allclose(w0["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(w0["head_kernel"], single["head_kernel"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(w0["head_kernel"], w1["head_kernel"],
                               rtol=1e-6, atol=1e-7)
