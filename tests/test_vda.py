"""Video-Depth-Anything: window/streaming numerics and wrapper semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunif_tpu.iw3.depth.vda import (
    VideoDepthAnything, VideoDepthAnythingModel,
    VideoDepthAnythingStreamingModel, align_scale_shift,
)

pytestmark = pytest.mark.slow


def _tiny(num_frames=4):
    model = VideoDepthAnything(encoder="vits", num_frames=num_frames)
    params = model.init_params(jax.random.PRNGKey(0), (1, 2, 28, 28, 3))
    return model, params


def test_window_forward_shape():
    model, params = _tiny()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 28, 28, 3))
    out = model.apply_fn(params, x)
    assert out.shape == (1, 4, 28, 28, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_zero_init_motion_is_per_frame_identity():
    # motion modules have zero-init output projections, so at init a window
    # forward must equal frame-by-frame forwards (temporal mixing is off).
    model, params = _tiny()
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 28, 28, 3))
    win = model.apply_fn(params, x)
    for t in range(3):
        single = model.apply_fn(params, x[:, t:t + 1])
        np.testing.assert_allclose(np.asarray(win[:, t]),
                                   np.asarray(single[:, 0]),
                                   rtol=1e-4, atol=1e-5)


def _perturb_motion(params, scale=0.05):
    """Make the motion modules non-identity to exercise temporal paths."""
    def walk(p, path=""):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + "/" + k)
            elif "motion_modules" in path and k == "kernel" and \
                    path.endswith("proj_out"):
                key = jax.random.PRNGKey(len(path))
                out[k] = jax.random.normal(key, v.shape, v.dtype) * scale
            else:
                out[k] = v
        return out
    return walk(params)


def test_window_temporal_mixing_active_after_perturbation():
    model, params = _tiny()
    params = _perturb_motion(params)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 28, 28, 3))
    win = model.apply_fn(params, x)
    single = model.apply_fn(params, x[:, 0:1])
    # with non-zero motion weights, frame 0 must see frames 1..2
    assert float(jnp.abs(win[:, 0] - single[:, 0]).max()) > 1e-6


def test_streaming_first_frame_matches_window_t1():
    model, params = _tiny()
    params = _perturb_motion(params)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 1, 28, 28, 3))
    caches = model.init_caches(1, 28, 28, dtype=jnp.float32)
    out_s, caches = model.apply(
        {"params": params}, x, caches=caches)
    out_w = model.apply_fn(params, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_w),
                               rtol=2e-2, atol=1e-4)
    assert int(caches[0]["n"]) == 1


def test_streaming_cache_carries_context():
    model, params = _tiny()
    params = _perturb_motion(params)
    key = jax.random.PRNGKey(5)
    f0 = jax.random.uniform(key, (1, 1, 28, 28, 3))
    f1 = jax.random.uniform(jax.random.fold_in(key, 1), (1, 1, 28, 28, 3))
    caches = model.init_caches(1, 28, 28, dtype=jnp.float32)
    _, caches = model.apply({"params": params}, f0, caches=caches)
    out_ctx, _ = model.apply({"params": params}, f1, caches=caches)
    fresh = model.init_caches(1, 28, 28, dtype=jnp.float32)
    out_fresh, _ = model.apply({"params": params}, f1, caches=fresh)
    assert float(jnp.abs(out_ctx - out_fresh).max()) > 1e-7


def test_streaming_ring_overflow():
    # more steps than the window: buffer must keep working (shift path)
    model, params = _tiny(num_frames=3)
    caches = model.init_caches(1, 28, 28, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 1, 28, 28, 3))
    for _ in range(5):
        out, caches = model.apply({"params": params}, x, caches=caches)
    assert int(caches[0]["n"]) == 3
    assert bool(jnp.all(jnp.isfinite(out)))


def test_align_scale_shift():
    ref = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (2, 8, 8, 1)),
                      jnp.float32)
    new = (ref - 0.25) / 2.0
    s, t = align_scale_shift(new, ref)
    np.testing.assert_allclose(float(s), 2.0, rtol=1e-4)
    np.testing.assert_allclose(float(t), 0.25, atol=1e-3)


@pytest.fixture(scope="module")
def online_model():
    m = VideoDepthAnythingModel("VDA_S", window_size=4, overlap=2)
    m.prep_lower_bound = 28
    m.model = VideoDepthAnything(encoder="vits", num_frames=4)
    m.params = m.model.init_params(jax.random.PRNGKey(0), (1, 2, 28, 28, 3))
    return m


def test_online_wrapper_lag_and_flush(online_model):
    m = online_model
    m.reset()
    N = 7
    total = 0
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 30, 30, 3)),
                    jnp.float32)
    for i in range(N):
        outs = m.infer_with_normalize(x, pts=[i])
        total += len(outs)
        assert total <= i + 1  # output never leads input
    total += len(m.flush_with_normalize())
    assert total == N
    m.reset()


def test_online_wrapper_reset_pts(online_model):
    m = online_model
    m.reset()
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 30, 30, 3)),
                    jnp.float32)
    total = 0
    for i in range(5):
        outs = m.infer_with_normalize(x, pts=[i], reset_pts={2})
        total += len(outs)
        if i == 2:
            assert total == 3  # scene cut flushes everything so far
    total += len(m.flush_with_normalize())
    assert total == 5
    m.reset()


def test_streaming_wrapper_no_lag():
    m = VideoDepthAnythingStreamingModel("VDA_Stream_S", window_size=3)
    m.prep_lower_bound = 28
    m.model = VideoDepthAnything(encoder="vits", num_frames=3)
    m.params = m.model.init_params(jax.random.PRNGKey(0), (1, 1, 28, 28, 3))
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (2, 30, 30, 3)),
                    jnp.float32)
    out = m.infer(x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert bool(jnp.all(jnp.isfinite(out)))
    # normalization path used by the generic video pipeline
    normalized = m.minmax_normalize(out)
    assert len(normalized) == 2


def test_metric_variant_postprocess():
    m = VideoDepthAnythingStreamingModel("VDA_Stream_Metric_S", window_size=3)
    m.prep_lower_bound = 28 + 2 * 14  # metric path pads by 14 per side
    m.model = VideoDepthAnything(encoder="vits", max_depth=20.0, num_frames=3)
    m.params = m.model.init_params(jax.random.PRNGKey(0), (1, 1, 56, 56, 3))
    assert m.is_metric() is False  # force_disparity=True (reference :119)
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 30, 30, 3)),
                    jnp.float32)
    out = m.infer(x)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(out > 0))  # disparity = 1/(depth+0.1) > 0


def test_staged_scan_matches_per_frame_steps():
    """The batched-stages + scanned-motions program
    (VideoDepthAnythingStreamingModel._scan_fn) must produce the same
    outputs and caches as the per-frame whole-model streaming step — the
    recurrence semantics are identical, only the batching of the
    per-frame-independent work differs."""
    model, params = _tiny(num_frames=3)
    params = _perturb_motion(params)
    T, H, W = 5, 28, 28
    frames = jax.random.uniform(jax.random.PRNGKey(9), (T, H, W, 3),
                                jnp.float32)

    # reference: the original per-frame step
    caches = model.init_caches(1, H, W, dtype=jnp.float32)
    want = []
    for t in range(T):
        out, caches = model.apply({"params": params},
                                  frames[t][None, None].astype(jnp.float32),
                                  caches=caches)
        want.append(np.asarray(out[0, 0], np.float32))
    want = np.stack(want)

    # staged scan via the wrapper's program builder
    wrapper = VideoDepthAnythingStreamingModel.__new__(
        VideoDepthAnythingStreamingModel)
    wrapper.model = model
    wrapper._jit_cache = {}
    run = wrapper._scan_fn(H, W, T)
    caches0 = model.init_caches(1, H, W, dtype=jnp.float32)
    got, got_caches = run(params, frames, caches0)
    got = np.asarray(got, np.float32).reshape(want.shape)

    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-4)
    ref_caches = caches
    for i in range(4):
        assert int(got_caches[i]["n"]) == int(ref_caches[i]["n"])
        np.testing.assert_allclose(
            np.asarray(got_caches[i]["ring1"], np.float32),
            np.asarray(ref_caches[i]["ring1"], np.float32),
            rtol=2e-2, atol=2e-4)
