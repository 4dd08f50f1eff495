"""CLI entry point: ``python -m mla_tpu.runtime.cli --train --gs_flag ...``

Preserves every README command line (reference: README.md:47-88, main.py:968
calls main(av_alpha=0.55) — the same default is applied when --av_alpha is
left at its parser default).
"""

from __future__ import annotations

import sys

from mla_tpu.core.config import config_from_args


def main(argv=None):
    cfg = config_from_args(argv)
    # multi-host: must run before anything can touch the XLA backend, so the
    # driver import (whose transitive imports may compile) comes after
    from mla_tpu.parallel import distributed
    distributed.initialize(cfg)
    from mla_tpu.runtime.driver import run
    # main.py:968: the driver overrides av_alpha to 0.55 for 2-modal training
    if "--av_alpha" not in (argv or sys.argv):
        cfg = cfg.replace(av_alpha=0.55)
    run(cfg)


if __name__ == "__main__":
    main()
