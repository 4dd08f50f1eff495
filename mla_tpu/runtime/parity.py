"""One-command real-data accuracy parity: reference eval vs this framework.

Closes BASELINE.md protocol step 2 the day real data appears: given dataset
artifact roots and a trained reference checkpoint (e.g. the released Zenodo
.pth files, reference README.md:29), run BOTH evals and diff top-1.

    python -m mla_tpu.runtime.parity --dataset CREMAD --lorb base --gs_flag \
        -dynamic --data_root ROOT --ckpt_path model.pth \
        [--reference /root/reference] [--tolerance 0.3] [--out report.json]

Takes the full training-CLI flag surface (core/config.py); extra flags:
  --reference DIR   the PyTorch reference checkout (default /root/reference);
                    pass --reference "" to skip the torch side and only print
                    this framework's accuracy
  --tolerance PCT   pass/fail band on |top-1 diff| in percentage points
                    (default 0.3, the BASELINE.md target)
  --out FILE        also write the JSON verdict to FILE

Both sides consume the SAME test batches from this repo's deterministic
loader (tests/ab_harness conversion shims; the loader's transforms are pinned
law-by-law against torch/PIL/librosa in tests/test_ops.py and the eval math
is pinned by the E2E A/B — eval-at-init parity is EXACT in every family,
BASELINE.md). The reference side is its own `valid()` from main.py (CUDA
shimmed to CPU) on its own model classes with the same .pth
(main.py:946-953); ours is the driver's eval-only branch, which imports .pth
through models/torch_import (strict key mapping).

Dry-tested end-to-end on the synthetic fixture tree
(tests/test_eval_paths.py::TestParityRecipe) so it is guaranteed runnable.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load_ab_harness():
    path = os.path.join(REPO_ROOT, "tests", "ab_harness.py")
    if not os.path.exists(path):
        raise SystemExit(f"parity needs tests/ab_harness.py (not at {path})")
    spec = importlib.util.spec_from_file_location("ab_harness", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_accs(cfg, reference_root: str, test_batches, ckpt_path: str):
    """The reference's own valid() on its own model + the same .pth and the
    same test batches -> {'acc','acc_a','acc_v'[,'acc_t']}."""
    import torch
    import torch.nn as nn

    ab = _load_ab_harness()
    ab.REF_ROOT = reference_root
    ref = ab.load_reference()
    args = ab.ref_namespace(cfg, cfg.av_alpha)

    if cfg.lorb in ("m3ae", "large"):
        # the ctors torch.load hardcoded '/path/to/*.pth' pretrained files
        # (basic_model.py:108-117,166-174,234-242); {} + strict=False keeps
        # random init — the real weights come from ckpt_path below
        _load = torch.load
        torch.load = lambda *a, **k: {}
        try:
            model = (ref.CAVClassifier(args) if cfg.lorb == "large"
                     else ref.Modal3Classifier(args) if cfg.modal3
                     else ref.M3AEClassifier(args))
        finally:
            torch.load = _load
    elif cfg.clip:
        model = ref.CLIPClassifier(args)
    else:
        model = ref.AVClassifier(args)
    model = nn.DataParallel(model)  # Zenodo ckpts carry 'module.' keys
    loaded = torch.load(ckpt_path, map_location="cpu")
    sd = loaded.get("model", loaded) if isinstance(loaded, dict) else loaded
    missing, unexpected = model.load_state_dict(sd, strict=False)
    if missing or unexpected:
        print(f"reference load_state_dict: missing={list(missing)[:4]} "
              f"unexpected={list(unexpected)[:4]}", file=sys.stderr)
    model.eval()

    conv = (ab.to_torch_modal3 if cfg.modal3
            else ab.to_torch_m3ae if cfg.lorb == "m3ae"
            else ab.to_torch_large if cfg.lorb == "large"
            else ab.to_torch_clip if cfg.clip
            else ab.to_torch_base)
    test_t = [conv(b) for b in test_batches]
    kw = dict(a_alpha=cfg.a_alpha, v_alpha=cfg.v_alpha,
              t_alpha=cfg.t_alpha) if cfg.modal3 else {}
    ret = ref.valid(args, model, torch.device("cpu"), test_t,
                    gs_flag=cfg.gs_flag, av_alpha=cfg.av_alpha, **kw)
    keys = ("acc", "acc_a", "acc_v") + (("acc_t",) if cfg.modal3 else ())
    return {k: float(v) for k, v in zip(keys, ret)}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--reference", default="/root/reference")
    extra.add_argument("--tolerance", default=0.3, type=float,
                       help="pass band on |top-1 diff|, percentage points")
    extra.add_argument("--out", default=None)
    mine, rest = extra.parse_known_args(argv)

    from mla_tpu.core.config import config_from_args
    cfg = config_from_args(rest)
    if cfg.train:
        raise SystemExit("parity is an eval-only protocol; drop --train")
    if not cfg.ckpt_path or not os.path.exists(cfg.ckpt_path):
        raise SystemExit("--ckpt_path must point to the trained checkpoint "
                         f"(got {cfg.ckpt_path!r})")

    # capture the shared test stream BEFORE the driver (identical batches).
    # torch cannot ingest bf16 numpy (the default --compute_dtype loader
    # emission); the f32 upcast is value-exact. For the strictest diff run
    # with --compute_dtype float32 (the dry test pins diff == 0.0 there).
    import ml_dtypes
    import numpy as np
    ab = _load_ab_harness()
    _, test_bs, _ = ab.capture_batches(cfg, epochs=0)
    up = lambda a: a.astype(np.float32) if a.dtype == ml_dtypes.bfloat16 \
        else a
    test_bs = [{k: up(np.asarray(v)) for k, v in b.items()} for b in test_bs]

    from mla_tpu.runtime.driver import run
    _, ours = run(cfg)
    ours = {k: float(v) for k, v in ours.items()}

    report = {"config": {"dataset": cfg.dataset, "lorb": cfg.lorb,
                         "modal3": cfg.modal3, "clip": cfg.clip,
                         "gs_flag": cfg.gs_flag, "dynamic": cfg.dynamic,
                         "modulation": cfg.modulation,
                         "ckpt": cfg.ckpt_path},
              "ours": ours}
    if mine.reference:
        ref_accs = reference_accs(cfg, mine.reference, test_bs, cfg.ckpt_path)
        diffs = {k: round((ours[k] - ref_accs[k]) * 100.0, 4)
                 for k in ref_accs if k in ours}
        report["reference"] = ref_accs
        report["diff_pct_points"] = diffs
        report["tolerance_pct_points"] = mine.tolerance
        report["pass"] = bool(abs(diffs.get("acc", 0.0)) <= mine.tolerance)
    else:
        report["reference"] = None

    line = json.dumps(report)
    print(line)
    if mine.out:
        with open(mine.out, "w") as f:
            f.write(line + "\n")
    if mine.reference and not report["pass"]:
        raise SystemExit(2)
    return report


if __name__ == "__main__":
    main()
