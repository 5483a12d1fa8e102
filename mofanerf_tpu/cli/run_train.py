"""Training CLI — counterpart of the reference's `python run_train.py
--config configs/exp_mofanerf.txt` (run_train.py:407-410)."""
from __future__ import annotations

import sys

from mofanerf_tpu.config import load_config
from mofanerf_tpu.train.loop import train


def main(argv=None) -> None:
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
