"""Benchmark harness: CREMA-D clips/sec/chip on the flagship MLA config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full per-clip training cost of the north-star config
(CREMA-D, --lorb base --gs_flag): device-side image preprocessing
(uint8 -> crop/resize/normalize) + both ResNet-18 encoders + shared head +
the K=2 alternating optimizer sub-steps, at the reference batch size 64
(reference: README.md:50, main.py:28).

vs_baseline: ratio against the PyTorch reference model executed on this host
(same batch shapes, same ResNet-18 forward+backward+2xSGD alternating steps,
torch CPU — no CUDA device exists in this image; the reference's own GPU
numbers are unpublished, BASELINE.md). The asymmetry is noted in the "note"
field.
"""

import json
import os
import time

import numpy as np


BATCH = 64
SPEC_HW = (129, 626)  # n_fft=256 -> 129 bins (extract_spec.py:21)
IMG = 224
N_FRAMES = 3


def bench_tpu(steps=20):
    import jax
    import jax.numpy as jnp
    from mla_tpu.core.config import MLAConfig
    from mla_tpu.data import transforms as T
    from mla_tpu.models.classifiers import build_classifier, resolve_pallas_conv
    from mla_tpu.ops import image as im
    from mla_tpu.train import optim, steps as steps_lib
    from mla_tpu.train.state import create_train_state

    cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                    train=True).validate()
    # the driver's own factory, so the bench measures exactly the model the
    # driver ships (incl. the resolve_pallas_conv routing — hand-building
    # AVClassifier here silently dropped the Pallas conv in rounds 3-4)
    model = build_classifier(cfg, dtype=jnp.bfloat16)
    assert model.pallas_conv == resolve_pallas_conv(cfg)
    rng = np.random.default_rng(0)

    canon = T.CANONICAL[IMG]
    frames_u8 = jnp.asarray(rng.integers(0, 255, (BATCH, N_FRAMES, canon, canon, 3),
                                         dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile(np.array([10, 10, 200, 200], np.float32), (BATCH, N_FRAMES, 1)))
    flips = jnp.asarray(rng.random((BATCH, N_FRAMES)) < 0.5)
    spec_np = rng.standard_normal((BATCH, 1) + SPEC_HW).astype(np.float32)
    label = jnp.asarray(rng.integers(0, 6, BATCH), jnp.int32)

    opt_spec = optim.make_spec(cfg)
    init_batch = {
        "spec": jnp.asarray(spec_np),
        "image": jnp.zeros((BATCH, 3, N_FRAMES, IMG, IMG), jnp.float32),
        "label": label, "idx": jnp.arange(BATCH, dtype=jnp.int32),
        "valid": jnp.ones((BATCH,), jnp.float32)}
    state = create_train_state(model, cfg, init_batch, opt_spec)
    mla_step = steps_lib.make_mla_train_step(model, cfg, opt_spec, len_dl=105)

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def full_step(state, frames_u8, boxes, flips, spec, label, key, lr, bi):
        image = T.av_frames_transform(frames_u8, boxes, flips, key, out=IMG,
                                      out_dtype=jnp.bfloat16)
        batch = {"spec": spec, "image": image, "label": label,
                 "idx": jnp.arange(BATCH, dtype=jnp.int32),
                 "valid": jnp.ones((BATCH,), jnp.float32)}
        return mla_step(state, batch, lr, bi)

    key = jax.random.key(0)
    lr = jnp.float32(1e-3)
    spec_dev = jnp.asarray(spec_np)
    # warmup / compile (float() forces a host read — block_until_ready alone
    # is not a reliable sync on the axon relay platform)
    state, m = full_step(state, frames_u8, boxes, flips, spec_dev, label, key,
                         lr, jnp.int32(0))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = full_step(state, frames_u8, boxes, flips, spec_dev, label,
                             key, lr, jnp.int32(i))
    # the final loss depends on the whole donated-state chain: reading it
    # forces every step to have executed
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return BATCH / dt, dt


def bench_torch_reference(steps=2):
    """The reference's per-batch MLA work (forward both encoders + 2 alternating
    backward/step) on this host via the reference model classes loaded from
    /root/reference (read-only import, no code copied)."""
    import sys
    import torch
    import torch.nn as nn
    sys.path.insert(0, "/root/reference")
    try:
        from models.backbone import resnet18
    except Exception as e:
        return None, f"reference import failed: {e}"

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.audio_net = resnet18(modality="audio")
            self.visual_net = resnet18(modality="visual")
            self.head = nn.Linear(512, 6)

    torch.set_num_threads(os.cpu_count() or 1)
    net = Net()
    crit = nn.CrossEntropyLoss()
    opt = torch.optim.SGD(net.parameters(), lr=1e-3, momentum=0.9,
                          weight_decay=1e-4)
    b = 8  # smaller batch, scaled per-clip
    spec = torch.randn(b, 1, *SPEC_HW)
    image = torch.randn(b, 3, N_FRAMES, IMG, IMG)
    label = torch.randint(0, 6, (b,))

    def one_step():
        a = net.audio_net(spec).mean(dim=(2, 3))
        v = net.visual_net(image)
        v = v.view(b, N_FRAMES, 512, *v.shape[2:]).mean(dim=(1, 3, 4))
        loss_a = crit(net.head(a), label)
        loss_a.backward(retain_graph=True)
        opt.step(); opt.zero_grad()
        loss_v = crit(net.head(v), label)
        loss_v.backward()
        opt.step(); opt.zero_grad()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return b / dt, None


def main():
    clips_per_sec, step_time = bench_tpu()
    ref_cps, err = None, None
    try:
        ref_cps, err = bench_torch_reference()
    except Exception as e:  # never let the baseline probe kill the benchmark
        err = str(e)
    vs = (clips_per_sec / ref_cps) if ref_cps else None
    print(json.dumps({
        "metric": "CREMA-D MLA train clips/sec/chip (preprocess+encode+fuse+2-step update)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "note": ("baseline = PyTorch reference ResNet-18 MLA batch-step on this "
                 f"host CPU ({os.cpu_count()} core(s); no CUDA in image — NOT "
                 "the reference's GPU envelope, see BASELINE.md); step_time_s="
                 f"{step_time:.4f}; batch=64 (reference parity; batch 128 "
                 "measures 1662 clips/s — BASELINE.md roofline section)"
                 + (f"; baseline_err={err}" if err else "")),
    }))


if __name__ == "__main__":
    main()
