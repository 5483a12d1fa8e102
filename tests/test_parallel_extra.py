import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mofanerf_tpu.parallel.mesh import make_multihost_mesh


def test_multihost_mesh_single_process_shape():
    mesh = make_multihost_mesh(n_model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 1
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_multihost_mesh_psum_over_both_axes():
    """A gradient-style reduction over (dcn, data) must produce the global
    sum — the collective pattern of multi-host data parallelism."""
    mesh = make_multihost_mesh(n_model=1)
    x = jnp.arange(8.0)
    rs = NamedSharding(mesh, P(("dcn", "data")))

    @jax.jit
    def global_sum(v):
        return jnp.sum(v)  # XLA inserts the cross-device reduction

    out = global_sum(jax.device_put(x, rs))
    np.testing.assert_allclose(float(out), 28.0)


def test_prefetcher_and_image_pool():
    from mofanerf_tpu.data.prefetch import Prefetcher, ImagePool

    seen = []
    pf = Prefetcher(lambda i: i * 10, depth=2)
    for b in pf.iterate(0, 5):
        seen.append(b)
    assert seen == [0, 10, 20, 30, 40]

    # error propagation
    def boom(i):
        if i == 2:
            raise ValueError("bad batch")
        return i

    pf2 = Prefetcher(boom, depth=1)
    got = []
    try:
        for b in pf2.iterate(0, 4):
            got.append(b)
        raised = False
    except ValueError:
        raised = True
    assert raised and got == [0, 1]

    pool = ImagePool(pool_size=0)
    x = np.ones((2, 4, 4, 3))
    assert pool.query(x) is x  # pass-through at pool_size=0
    pool2 = ImagePool(pool_size=4, seed=0)
    out = pool2.query(np.zeros((3, 2, 2, 3)))
    assert out.shape == (3, 2, 2, 3)
