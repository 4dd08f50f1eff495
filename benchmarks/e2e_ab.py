"""End-to-end behavioral A/B vs the ACTUAL reference implementation (CLI).

Runs the reference's own train_epoch/valid (imported from
/root/reference/main.py, torch CPU) and this framework on identical data and
init across the training regimes, printing the paired per-epoch trajectories
as a markdown table (recorded in BASELINE.md). The slow-tier test
(tests/test_e2e_ab.py) asserts the same trajectories within tolerance.

Usage: python benchmarks/e2e_ab.py [epochs] [n_train] [regime ...]
                                   [seed=7] [ntest=16]
Regimes: Normal OGM OGM_GE QMF MLA MLA_dynamic, optionally prefixed with a
family: ``m3ae:`` (MVSA image-text transformers, depth-1 768-wide both
sides — ab_harness.tiny_ref_m3ae), ``modal3:`` (IEMOCAP 3-modality, tiny
CAV-MAE audio + 2x depth-1 M3AE — ab_harness.CAV_TINY), ``large:``
(CREMA-D 2x tiny CAV-MAE), ``clip:`` (Food-101 precomputed features).
Unprefixed = the base ResNet CNN family.
"""

import os
import sys
import tempfile

os.environ.setdefault("OMP_NUM_THREADS", "1")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_harness import run_ab, trajectory_diffs  # noqa: E402

ALL = ["Normal", "OGM", "OGM_GE", "QMF", "MLA", "MLA_dynamic"]


def main():
    args = sys.argv[1:]
    # key=value tokens anywhere: seed=N (default 7), ntest=N (default 16)
    # — the VERDICT-r3 #8 second (seed, size) point for the CNN family
    kv = {k: int(v) for k, v in
          (a.split("=", 1) for a in args if "=" in a)}
    args = [a for a in args if "=" not in a]
    epochs = int(args[0]) if args else 3
    n_train = int(args[1]) if len(args) > 1 else 48
    regimes = args[2:] or ALL
    td = tempfile.mkdtemp()
    root = os.path.join(td, "d")
    print("| Regime | epoch | ref loss | ours loss | ref acc | ours acc |")
    print("|---|---|---|---|---|---|")
    summary = []
    for regime in regimes:
        fam, _, r_name = regime.rpartition(":")
        if fam not in ("", "m3ae", "large", "modal3", "clip"):
            raise SystemExit(f"unknown family prefix {fam!r} in {regime!r} "
                             "(use m3ae:/large:/modal3:/clip: or none)")
        ref, ours, ri, oi = run_ab(
            r_name, root, td, epochs=epochs, n_train=n_train,
            seed=kv.get("seed", 7), n_test=kv.get("ntest", 16),
            lorb=fam if fam in ("m3ae", "large") else "base",
            modal3=fam == "modal3", clip=fam == "clip")
        for r, o in zip(ref, ours):
            print(f"| {regime} | {r['epoch']} | {r['loss']:.5f} | "
                  f"{o['loss']:.5f} | {r['acc']:.4f} | {o['acc']:.4f} |")
        dl, da = trajectory_diffs(ref, ours)
        summary.append((regime, ri["acc"], oi["acc"], dl, da))
    print()
    print("| Regime | init acc (ref) | init acc (ours) | max |Δloss| | max |Δacc| |")
    print("|---|---|---|---|---|")
    for regime, ra, oa, dl, da in summary:
        print(f"| {regime} | {ra:.4f} | {oa:.4f} | {dl:.4f} | {da:.4f} |")


if __name__ == "__main__":
    main()
