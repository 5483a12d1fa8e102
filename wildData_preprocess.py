#!/usr/bin/env python
"""Wild-photo preprocessing (same entry point name as the reference)."""
from mofanerf_tpu.cli.wild_preprocess import main

if __name__ == "__main__":
    main()
