"""A/B: host-prefetched vs device-resident training throughput on the real
faces8 dataset at flagship dims (run AFTER the morphable chain is done —
contends for the chip). Writes artifacts/device_data_throughput.json."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_ITERS = int(os.environ.get("N_ITERS", "600"))
WARM = int(os.environ.get("WARM", "100"))


def run(device_data: bool) -> float:
    import subprocess
    import re

    # fresh process per arm: fair compile/caching treatment, no state leak
    code = f"""
import sys, time
sys.path.insert(0, "/root/repo")
from mofanerf_tpu.config import Config
from mofanerf_tpu.train.loop import train
cfg = Config(
    expname="ddbench_{device_data}", basedir="/tmp/ddbench",
    datadir="studydata/faces8", uvdir="studydata/faces8/uv",
    shape_codes_path="studydata/faces8/factors_id.npy",
    landmarks_path="studydata/faces8/landmarks.npy",
    person_num=8, testskip=1, i_print=100, i_weights=10**9,
    i_testset=10**9, i_video=10**9, i_grid=0,
    precrop_iters=0, lm_frac_anneal_iters=0,
    device_data={device_data}, scan_steps=100,
    no_reload=True,
)
train(cfg, n_iters={N_ITERS})
"""
    t0 = time.time()
    out = subprocess.run([sys.executable, "-u", "-c", code],
                         capture_output=True, text=True, timeout=3600)
    print(out.stdout[-2000:])
    if out.returncode != 0:
        print(out.stderr[-3000:])
        raise SystemExit(f"arm device_data={device_data} failed")
    # steady-state rate: iters WARM..N_ITERS over their wall time, from the
    # cumulative it/s prints (rate = i/elapsed -> elapsed = i/rate)
    rates = {}
    for m in re.finditer(r"iter (\d+) .* it/s ([0-9.]+)", out.stdout):
        rates[int(m.group(1))] = float(m.group(2))
    assert N_ITERS in rates and WARM in rates, sorted(rates)
    t_warm = WARM / rates[WARM]
    t_end = N_ITERS / rates[N_ITERS]
    return (N_ITERS - WARM) / (t_end - t_warm)


if __name__ == "__main__":
    host = run(False)
    dev = run(True)
    res = {
        "study": "host-prefetched vs device-resident batch pipeline, "
                 "flagship dims (8x256+10x1024, N_rand 1024), real faces8 "
                 "dataset (1296 train frames @128^2), one-core host",
        "iters_measured": [WARM, N_ITERS],
        "host_path_it_per_sec": round(host, 2),
        "device_data_it_per_sec": round(dev, 2),
        "speedup": round(dev / host, 2),
        "note": "device path = data/device_data.py (uint8 split in HBM, "
                "in-graph sampling, 100-step lax.scan chunks); "
                "bench.py train_steps_per_sec (fixed in-memory batch) is "
                "the dispatch-free compute ceiling",
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/device_data_throughput.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
