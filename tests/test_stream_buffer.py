import jax
import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.data.stream_buffer import StreamBuffer


def test_push_and_access():
    buf = StreamBuffer.create(jnp.zeros((2,)), capacity=3)
    for i in range(1, 4):
        buf = buf.push(jnp.full((2,), float(i)))
    assert int(buf.count) == 3
    np.testing.assert_allclose(np.asarray(buf.oldest()), 1.0)
    np.testing.assert_allclose(np.asarray(buf.centre()), 2.0)
    np.testing.assert_allclose(np.asarray(buf.newest()), 3.0)


def test_eviction_wraps():
    buf = StreamBuffer.create(jnp.zeros(()), capacity=3)
    for i in range(5):
        buf = buf.push(jnp.asarray(float(i)))
    assert int(buf.count) == 3
    np.testing.assert_allclose(np.asarray(buf.oldest()), 2.0)
    np.testing.assert_allclose(np.asarray(buf.newest()), 4.0)
    np.testing.assert_allclose(np.asarray(buf.get(1)), 3.0)


def test_skip():
    buf = StreamBuffer.create(jnp.zeros(()), capacity=4)
    for i in range(4):
        buf = buf.push(jnp.asarray(float(i)))
    buf = buf.skip(2)
    assert int(buf.count) == 2
    np.testing.assert_allclose(np.asarray(buf.oldest()), 2.0)


def test_convolve_matches_manual():
    buf = StreamBuffer.create(jnp.zeros((3,)), capacity=4)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]  # wraps once
    for v in vals:
        buf = buf.push(jnp.full((3,), v))
    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    out = np.asarray(buf.convolve(w))
    # logical window is [2, 3, 4, 5]
    expected = 0.1 * 2 + 0.2 * 3 + 0.3 * 4 + 0.4 * 5
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_push_under_jit_and_scan():
    buf = StreamBuffer.create(jnp.zeros(()), capacity=5)

    def step(b, x):
        b = b.push(x)
        return b, b.newest()

    xs = jnp.arange(8.0)
    final, ys = jax.jit(lambda b: jax.lax.scan(step, b, xs))(buf)
    np.testing.assert_allclose(np.asarray(ys), np.arange(8.0))
    assert int(final.count) == 5
    np.testing.assert_allclose(np.asarray(final.oldest()), 3.0)
