#!/usr/bin/env python
"""RefineNet inference (same entry point name as the reference)."""
from mofanerf_tpu.cli.run_refine import main

if __name__ == "__main__":
    main()
