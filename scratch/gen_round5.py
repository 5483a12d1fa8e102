"""Round-5 dataset generation (host CPU; sequence with TPU work — see
CLAUDE.md 1-core host notes).

All identity draws share seed 11, so ids 0..15 are bit-identical to the
round-3/4 faces16 family (one uniform((n,10)) fill — leading rows agree):
  faces32      32 ids x 4 exps  @128^2, 20 views/exp — the identity-scaling
               point (VERDICT r4 #4: 8/16/32 curve). ~9 min.
  faces32hi    32 ids x 4 exps  @256^2, same poses    — sharp GT for the
               RefineNet corpus (rendered from morphable32). ~35 min.
  faces16x20   16 ids x 20 exps @128^2, 20 views/exp — full expression bank
               with the r5-STRENGTHENED non-legacy deltas (VERDICT r4 #5);
               fine-tuned from the morphable32 checkpoint. ~22 min.
  faces32hi512 32 ids x 2 exps  @512^2 — GT for the 512^2 refine study
               (VERDICT r5 #7). ~70 min; generate only if budget remains.

Rasterization is ~res^2-bound on this 1-core host (~0.2 s/frame @128^2),
so the sets are selectable: --sets faces32,faces16x20 etc., cheapest-first
by default so downstream TPU stages unblock as early as possible.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

SETS = {
    "faces32": dict(n_ids=32, exp_ids=(0, 1, 2, 18), res=128),
    # seed-11 prefix property again: ids 0..31 bit-identical to faces32.
    # Extends the identity-scaling curve to a 4th point (~18 min CPU).
    "faces64": dict(n_ids=64, exp_ids=(0, 1, 2, 18), res=128),
    "faces16x20": dict(n_ids=16, exp_ids=tuple(range(20)), res=128),
    "faces32hi": dict(n_ids=32, exp_ids=(0, 1, 2, 18), res=256),
    "faces32hi512": dict(n_ids=32, exp_ids=(0, 1), res=512),
    # seed 7 = the faces8 family (family.json): pixel-aligned 512^2 GT for
    # the ALREADY-TRAINED flagship — the lite 512^2 refine study (~18 min).
    "faces8hi512": dict(n_ids=8, exp_ids=(0, 1), res=512, seed=7),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sets", default="faces32,faces16x20,faces32hi",
                   help="comma-separated subset of: " + ",".join(SETS))
    args = p.parse_args()

    for name in args.sets.split(","):
        name = name.strip()
        if not name:
            continue
        spec = dict(SETS[name])
        seed = spec.pop("seed", 11)
        t0 = time.time()
        out = make_face_dataset(
            f"/root/repo/studydata/{name}", seed=seed,
            n_workers=1, view_stride=6, n_holdout=6, **spec)
        print(f"{name} done ({time.time() - t0:.0f}s), params {out.shape}",
              flush=True)
    print("GEN_ROUND5 COMPLETE")


if __name__ == "__main__":
    main()
