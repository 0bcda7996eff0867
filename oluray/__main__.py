"""`python -m oluray` entry point (see `oluray.cli`)."""

import sys

from oluray.cli import main

if __name__ == "__main__":
    sys.exit(main())
