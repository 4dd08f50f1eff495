"""Host input-path benchmark: the m3ae/Food-101 loader (VERDICT r1 next #8).

Food-101 is the host-heaviest config: 62,970 train JPEGs/epoch (reference
main.py:813-817 uses a 32-worker DataLoader for it). This measures host batch
production (JPEG decode + resize + token .npy reads) in clips/s on realistic
~512x384 JPEGs, and compares it against the measured TPU m3ae step rate so the
host-bound risk is quantified per host core count.

Usage: python benchmarks/bench_loader.py [n_clips]
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

# host-only benchmark: keep JAX off the TPU relay (single-client chip)
if "JAX_PLATFORMS" not in os.environ:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

from mla_tpu.core.config import MLAConfig  # noqa: E402
from mla_tpu.data import synthetic  # noqa: E402
from mla_tpu.data.datasets import build_adapter  # noqa: E402
from mla_tpu.data.pipeline import Loader  # noqa: E402

# measured on 1x v5e (BASELINE.md config matrix): Food-101 m3ae MLA train step
TPU_M3AE_CLIPS_PER_S = 299.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ncores = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as root:
        synthetic.make_m3ae(root, dataset="FOOD101", n_train=n, n_test=4,
                            img_hw=(384, 512))
        cfg = MLAConfig(dataset="FOOD101", lorb="m3ae", gs_flag=True,
                        train=True, data_root=root, batch_size=64,
                        num_workers=ncores).validate()
        adapter = build_adapter(cfg, "train")
        loader = Loader(adapter, cfg.batch_size, mesh=None, shuffle=True,
                        num_workers=ncores)

        # warm page cache + compile any finish_batch transforms
        for _ in loader.epoch(0):
            pass
        t0 = time.perf_counter()
        clips = 0
        for hb in loader.epoch(1):
            clips += int(hb["valid"].sum())
        dt = time.perf_counter() - t0

    host_cps = clips / dt
    print(json.dumps({
        "metric": "Food-101 m3ae host loader clips/s (JPEG 512x384 decode+"
                  "resize + token npy)",
        "value": round(host_cps, 2),
        "unit": "clips/s",
        "host_cores": ncores,
        "tpu_step_clips_per_s": TPU_M3AE_CLIPS_PER_S,
        "host_bound": host_cps < TPU_M3AE_CLIPS_PER_S,
        "cores_needed_for_parity": round(
            ncores * TPU_M3AE_CLIPS_PER_S / host_cps, 1),
    }))


if __name__ == "__main__":
    main()
