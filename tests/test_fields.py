

def test_noise_volume_grad_bitwise_matches_separate_evals():
    """The hash-shared fused eval (fields_soa.noise_volume_grad) must be
    BIT-IDENTICAL to noise_volume + gradient: the lattice arithmetic is
    exact integer math in f32, so corner sharing changes nothing."""
    import numpy as np
    import jax.numpy as jnp
    from vokselis_tpu.volume import fields_soa

    rng = np.random.default_rng(11)
    cx, cy, cz = (jnp.asarray(rng.uniform(-1, 1, 4096), jnp.float32)
                  for _ in range(3))
    for sin_t in (0.0, 0.71):
        v0, a0 = fields_soa.noise_volume(cx, cy, cz, sin_t)
        g = fields_soa.gradient(cx, cy, cz, sin_t)
        fv, fa, gx, gy, gz = fields_soa.noise_volume_grad(cx, cy, cz, sin_t)
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(a0))
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(g[0]))
        np.testing.assert_array_equal(np.asarray(gy), np.asarray(g[1]))
        np.testing.assert_array_equal(np.asarray(gz), np.asarray(g[2]))
