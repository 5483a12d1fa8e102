#!/usr/bin/env python
"""RefineNet training (same entry point name as the reference)."""
from mofanerf_tpu.cli.run_train_refinenet import main

if __name__ == "__main__":
    main()
