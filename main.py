"""Drop-in CLI entry: the reference's ``python main.py ...`` commands
(reference README.md:47-88) run unchanged against the TPU framework."""

from mla_tpu.runtime.cli import main

if __name__ == "__main__":
    main()
