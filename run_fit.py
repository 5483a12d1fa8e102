#!/usr/bin/env python
"""Fit latent codes + pose to a wild photo (same entry point name as the
reference)."""
from mofanerf_tpu.cli.run_fit import main

if __name__ == "__main__":
    main()
