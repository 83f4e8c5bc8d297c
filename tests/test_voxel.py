import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.ops import voxel


def test_encode_decode_roundtrip_host():
    vs = 1e-3
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 100.0, size=(1000, 3))
    vox, loc = voxel.encode_host(pos, vs)
    back = voxel.decode_host(vox, loc, vs)
    np.testing.assert_allclose(back, pos, atol=1e-7, rtol=0)
    assert (loc >= 0).all() and (loc < vs * (1 + 1e-6)).all()


def test_rel_pos_precision_far_from_origin():
    # Two points 1e-6 apart, 1e4 voxels from origin: naive f32 would lose
    # the separation; the voxel scheme keeps it.
    vs = 1e-2
    a = np.asarray([[123.4567890, 0.0, 0.0]])
    b = a + np.asarray([[1e-6, 0.0, 0.0]])
    va, la = voxel.encode_host(a, vs)
    vb, lb = voxel.encode_host(b, vs)
    rel = voxel.rel_pos(
        jnp.asarray(vb), jnp.asarray(lb), jnp.asarray(va), jnp.asarray(la), vs
    )
    np.testing.assert_allclose(np.asarray(rel)[0, 0], 1e-6, rtol=1e-3)


def test_advance_crosses_voxel_boundary():
    vs = 0.5
    vox = jnp.asarray([[0, 0, 0]], jnp.int32)
    loc = jnp.asarray([[0.4, 0.1, 0.45]], jnp.float32)
    disp = jnp.asarray([[0.2, -0.3, 0.0]], jnp.float32)
    v2, l2 = voxel.advance(vox, loc, disp, vs)
    np.testing.assert_array_equal(np.asarray(v2), [[1, -1, 0]])
    np.testing.assert_allclose(np.asarray(l2), [[0.1, 0.3, 0.45]], atol=1e-6)


def test_advance_many_steps_no_drift():
    # March 10k steps of +1e-4 along x; total must be 1.0 to f32-of-voxel
    # accuracy (error bounded by ulp(voxel) per step, voxel small).
    vs = 1e-3
    vox = jnp.zeros((1, 3), jnp.int32)
    loc = jnp.zeros((1, 3), jnp.float32)
    import jax

    def body(carry, _):
        v, l = carry
        v, l = voxel.advance(v, l, jnp.full((1, 3), 1e-4, jnp.float32), vs)
        return (v, l), None

    (vox, loc), _ = jax.lax.scan(body, (vox, loc), length=10000)
    final = voxel.decode_host(np.asarray(vox), np.asarray(loc), vs)
    np.testing.assert_allclose(final[0], [1.0, 1.0, 1.0], rtol=1e-5)
