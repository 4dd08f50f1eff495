"""CLI entry point: ``python -m mla_tpu.runtime.cli --train --gs_flag ...``

Preserves every README command line (reference: README.md:47-88, main.py:968
calls main(av_alpha=0.55) — the same default is applied when --av_alpha is
left at its parser default).
"""

from __future__ import annotations

import sys

from mla_tpu.core.config import config_from_args


def main(argv=None):
    # --av_alpha default handling (0.55 unless passed, main.py:968) lives in
    # config_from_args via a None parser sentinel — a raw argv scan missed
    # the --av_alpha=X form and argparse abbreviations
    cfg = config_from_args(argv)
    # multi-host: must run before anything can touch the XLA backend, so the
    # driver import (whose transitive imports may compile) comes after
    from mla_tpu.parallel import distributed
    distributed.initialize(cfg)
    from mla_tpu.runtime.driver import run
    run(cfg)


if __name__ == "__main__":
    main()
