#!/usr/bin/env python
"""Train the coarse MoFaNeRF model (same entry point name as the reference)."""
from mofanerf_tpu.cli.run_train import main

if __name__ == "__main__":
    main()
