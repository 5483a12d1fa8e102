#!/usr/bin/env python
"""RefineNet training-corpus renderer (same entry point name as the
reference)."""
from mofanerf_tpu.cli.render_refine_trainset import main

if __name__ == "__main__":
    main()
