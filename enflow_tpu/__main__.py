"""CLI entry point: ``python -m enflow_tpu <config.yaml>``.

Reference parity (``/root/reference/__main__.py``): the reference reads SLURM
env vars and hands them to torch DDP. Here multi-host initialization is
handled inside ``Main`` via ``jax.distributed`` when COORDINATOR_ADDRESS is
set; single-host needs nothing.
"""

import sys

from .train.driver import Main


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m enflow_tpu <config.yaml>", file=sys.stderr)
        return 2
    Main()(argv[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
