"""Batch-inference CLI over an exported serving artifact.

    python -m mla_tpu.runtime.serve --artifact DIR --input feats.npz \
        [--output preds.npz] [--topk 5]

`feats.npz` holds one array per feature the artifact expects (names from its
meta.json, e.g. token/padding_mask/image), leading axis = examples. Requests
larger than the biggest exported batch rung are chunked. Output: fused
logits, per-modality logits, and top-k class ids — written to --output or
summarized to stdout. No model code, no config: everything comes from the
artifact (runtime/export.py). The reference has no equivalent — inference
means re-running main.py's Python model under torch (main.py:946-953).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from mla_tpu.runtime.export import load_serving


def run_batch(srv, feats: dict, chunk: int | None = None):
    """Chunk a request of any length through the artifact's batch ladder."""
    names = srv.feature_names
    n = int(np.asarray(feats[names[0]]).shape[0])
    chunk = chunk or srv.batch_sizes[-1]
    outs = []
    for lo in range(0, n, chunk):
        outs.append(srv({k: np.asarray(v)[lo:lo + chunk]
                         for k, v in feats.items() if k in names}))
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def main(argv=None):
    p = argparse.ArgumentParser(description="mla-tpu batch inference")
    p.add_argument("--artifact", required=True,
                   help="directory written by --export_dir")
    p.add_argument("--input", required=True, help=".npz of feature arrays")
    p.add_argument("--output", default=None,
                   help=".npz for logits + predictions (default: stdout "
                        "summary only)")
    p.add_argument("--topk", default=1, type=int)
    args = p.parse_args(argv)

    srv = load_serving(args.artifact)
    with np.load(args.input) as z:
        feats = {k: z[k] for k in z.files}
    missing = [k for k in srv.feature_names if k not in feats]
    if missing:
        raise SystemExit(f"--input is missing features {missing} "
                         f"(artifact expects {srv.feature_names})")
    out = run_batch(srv, feats)
    order = np.argsort(-out["fused"], axis=1)
    out["topk"] = order[:, :args.topk].astype(np.int32)
    if args.output:
        np.savez(args.output, **out)
    n = out["fused"].shape[0]
    print(json.dumps({
        "examples": n, "n_classes": int(out["fused"].shape[1]),
        "family": srv.meta["family"],
        "pred_head": out["topk"][:, 0][:16].tolist(),
        "output": args.output}))


if __name__ == "__main__":
    main()
