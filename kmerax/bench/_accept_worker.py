"""One emulated-host worker for multi-process acceptance runs: forces the
CPU backend with 4 fake devices, then runs the production CLI verbatim
(argv after the process id). Used by kmerax.bench.acceptance_mp."""

import os
import sys


def main():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    from kmerax.cli import main as cli_main

    rc = cli_main(sys.argv[1:])
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
