"""``python -m haploconduct_tpu`` — the haploconduct CLI entry point."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
