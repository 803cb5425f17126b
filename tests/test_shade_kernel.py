"""Fused shade+regen kernel (interpret mode) vs the XLA persistent path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingweekend_jl_tpu import (make_scene, metal, lambertian, dielectric,
                                      default_camera, scene_2_spheres,
                                      scene_4_spheres, t_default_cam)
from raytracingweekend_jl_tpu.ops.integrator import (persistent_render_sum,
                                                     persistent_render_sum_fused)
from raytracingweekend_jl_tpu.render import pixel_coords

KEY = jax.random.PRNGKey(3)


def run_both(scene, cam, W=48, H=27, spp=4, max_depth=16):
    u, v = pixel_coords(W, H)
    a = persistent_render_sum(scene, cam, u, v, KEY, spp, 0, max_depth, 1e-4,
                              float(np.float32(W)), float(np.float32(H)))
    b = persistent_render_sum_fused(scene, cam, u, v, KEY, spp, 0, max_depth,
                                    1e-4, float(np.float32(W)),
                                    float(np.float32(H)), interpret=True)
    return np.asarray(a), np.asarray(b)


def test_fused_mirror_exact():
    # RNG-free paths (fuzz-0 metal, aperture 0, spp=1): bit-level agreement of
    # every deterministic quantity.
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    a, b = run_both(scene, cam, spp=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fused_sky_only_exact():
    scene = make_scene([])
    a, b = run_both(scene, t_default_cam(), spp=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fused_diffuse_statistical():
    a, b = run_both(scene_2_spheres(), t_default_cam(), spp=16)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.01 * 16
    assert np.abs(a - b).mean() / 16 < 0.06


def test_fused_all_materials_statistical():
    a, b = run_both(scene_4_spheres(), t_default_cam(), spp=16)
    assert abs(a.mean() - b.mean()) < 0.01 * 16


def test_fused_glass_energy():
    scene = make_scene([
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        dielectric((0, 0, -1), 0.5, 1.5),
        dielectric((-1, 0, -1), -0.45, 1.5),
    ])
    a, b = run_both(scene, t_default_cam(), spp=8)
    assert np.isfinite(b).all()
    assert (b >= 0).all() and (b / 8 <= 1.0 + 1e-4).all()
    assert abs(a.mean() - b.mean()) / 8 < 0.02


def test_fused_depth_semantics():
    # max_depth=1: hits die black after one scatter; sky misses accumulate.
    a, b = run_both(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def run_mega(scene, cam, W=48, H=27, spp=4, max_depth=16):
    from raytracingweekend_jl_tpu.ops.pallas.experimental.mega_kernel import (
        persistent_render_sum_mega)
    u, v = pixel_coords(W, H)
    return np.asarray(persistent_render_sum_mega(
        scene, cam, u, v, KEY, spp, 0, max_depth, 1e-4,
        float(np.float32(W)), float(np.float32(H)), interpret=True))


def test_mega_mirror_exact():
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    a, _ = run_both(scene, cam, spp=1)
    m = run_mega(scene, cam, spp=1)
    np.testing.assert_allclose(a, m, atol=1e-5)


def test_mega_sky_exact():
    scene = make_scene([])
    a, _ = run_both(scene, t_default_cam(), spp=1)
    m = run_mega(scene, t_default_cam(), spp=1)
    np.testing.assert_allclose(a, m, atol=1e-6)


def test_mega_statistical():
    a, _ = run_both(scene_4_spheres(), t_default_cam(), spp=16)
    m = run_mega(scene_4_spheres(), t_default_cam(), spp=16)
    assert np.isfinite(m).all()
    assert abs(a.mean() - m.mean()) / 16 < 0.01
    assert np.abs(a - m).mean() / 16 < 0.06


def test_mega_depth_semantics():
    a, _ = run_both(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    m = run_mega(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    np.testing.assert_allclose(a, m, atol=1e-6)


def run_strided(scene, cam, W=48, H=27, spp=4, max_depth=16, k=4):
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    u, v = pixel_coords(W, H)
    return np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, spp, 0, max_depth, 1e-4,
        float(np.float32(W)), float(np.float32(H)), k=k, interpret=True))


def test_strided_sky_exact():
    scene = make_scene([])
    a, _ = run_both(scene, t_default_cam(), spp=1)
    m = run_strided(scene, t_default_cam(), spp=1)
    np.testing.assert_allclose(a, m, atol=1e-5)


def test_strided_mirror_exact():
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    a, _ = run_both(scene, cam, spp=1)
    m = run_strided(scene, cam, spp=1)
    np.testing.assert_allclose(a, m, atol=1e-5)


def test_strided_statistical():
    a, _ = run_both(scene_4_spheres(), t_default_cam(), spp=16)
    m = run_strided(scene_4_spheres(), t_default_cam(), spp=16)
    assert np.isfinite(m).all()
    assert abs(a.mean() - m.mean()) / 16 < 0.01
    assert np.abs(a - m).mean() / 16 < 0.06


def test_strided_depth_semantics():
    a, _ = run_both(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    m = run_strided(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    np.testing.assert_allclose(a, m, atol=1e-6)


def test_strided_k_invariance():
    # Different k values cover the same (pixel, sample) set.
    scene = scene_2_spheres()
    m1 = run_strided(scene, t_default_cam(), spp=8, k=2)
    m2 = run_strided(scene, t_default_cam(), spp=8, k=8)
    assert abs(m1.mean() - m2.mean()) / 8 < 0.01


def test_strided_k_exceeds_pixels_per_lane_budget():
    # Tiny image with large k (more strips than makes sense): padding pixels
    # and early-inactive lanes must stay benign.
    m = run_strided(scene_2_spheres(), t_default_cam(), W=48, H=27, spp=4, k=64)
    a, _ = run_both(scene_2_spheres(), t_default_cam(), W=48, H=27, spp=4)
    assert np.isfinite(m).all()
    assert abs(a.mean() - m.mean()) / 4 < 0.01


def test_strided_sample_offset_chunking():
    # Two chunks (offsets 0 and 4) must cover the same sample set as one
    # 8-sample run: radiance SUMS add and agree statistically (RNG streams for
    # regenerated rays are iteration-keyed, so not bitwise).
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = scene_2_spheres()
    cam = t_default_cam()
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    args = (scene, cam, u, v, KEY)
    kw = dict(max_depth=16, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), k=4, interpret=True)
    a = np.asarray(persistent_render_sum_strided(*args, 4, 0, **kw))
    b = np.asarray(persistent_render_sum_strided(*args, 4, 4, **kw))
    full = np.asarray(persistent_render_sum_strided(*args, 8, 0, **kw))
    chunked = a + b
    assert np.isfinite(chunked).all()
    assert abs(chunked.mean() - full.mean()) / 8 < 0.01
    # The centered sample exists only in the offset-0 chunk: chunk b must be
    # fully jittered (strictly different from a at matched counts).
    assert not np.allclose(a, b)


def test_fused_chunk_seed_decorrelation():
    # Regenerated-sample RNG must be chunk-keyed: two 2-spp chunks with the
    # same key and different sample_offsets (the render_checkpointed /
    # sample-sharding pattern) may not replay identical regen streams
    # (round-1 advisor finding: base_seed ignored sample_offset, correlating
    # every chunk's samples). Isolate each chunk's regenerated sample by
    # subtracting its 1-spp render; on a sky-only scene the regen jitter fully
    # determines that contribution, so equal streams ⇒ equal differences.
    scene = make_scene([])
    cam = t_default_cam()
    W, H = 32, 18
    u, v = pixel_coords(W, H)

    def f(spp, off):
        return np.asarray(persistent_render_sum_fused(
            scene, cam, u, v, KEY, spp, off, 16, 1e-4,
            float(np.float32(W)), float(np.float32(H)), interpret=True))

    regen_a = f(2, 0) - f(1, 0)   # contribution of global sample 1
    regen_b = f(2, 2) - f(1, 2)   # contribution of global sample 3
    assert np.isfinite(regen_a).all() and np.isfinite(regen_b).all()
    # Distinct jitter draws move the sky lerp by far more than the float
    # cancellation noise of the subtraction (~1e-7).
    assert np.abs(regen_a - regen_b).max() > 1e-4


def test_strided_pixel_start_tiles_match_full():
    # A contiguous tile range must render the same pixels as the full image.
    # At k=1 every pixel is a strip-0 pixel, whose camera draws come from the
    # threefry path keyed by GLOBAL pixel id — so on an RNG-free material
    # path (fuzz-0 metal: the in-kernel scatter draws cancel) two half-image
    # tiles concatenated equal the full-image strided render exactly. (Scenes
    # consuming scatter RNG are tile-invariant only statistically — the
    # in-kernel PRNG is positional — covered by the multisample test below.)
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0),
                        metal((2, 1, -2), 1.0, (0.9, 0.9, 0.9), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    kw = dict(max_depth=8, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), interpret=True)
    full = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 1, 0, k=1, **kw))
    n = W * H
    half = n // 2
    a = np.asarray(persistent_render_sum_strided(
        scene, cam, u[:half], v[:half], KEY, 1, 0, k=1, pixel_start=0, **kw))
    b = np.asarray(persistent_render_sum_strided(
        scene, cam, u[half:], v[half:], KEY, 1, 0, k=1, pixel_start=half, **kw))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-6)


def test_strided_pixel_start_padding_inactive():
    # A tile extending past W*H (driver padding) must zero the out-of-image
    # pixels and not disturb the valid ones (RNG-free scene => exact).
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    n = W * H
    start, tile = n - 40, 64  # 40 valid + 24 padding pixels
    pad = tile - 40
    kw = dict(max_depth=8, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), interpret=True)
    full = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 1, 0, k=1, **kw))
    t_res = np.asarray(persistent_render_sum_strided(
        scene, cam, jnp.zeros((tile,)), jnp.zeros((tile,)), KEY, 1, 0, k=1,
        pixel_start=start, **kw))
    np.testing.assert_allclose(t_res[:40], full[start:], atol=1e-6)
    assert np.all(t_res[40:] == 0.0)


def test_strided_pixel_start_statistical_multisample():
    # Multi-sample tiles (regen exercised, strips advancing inside a tile
    # range): two tiles vs full image agree statistically.
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = scene_2_spheres()
    cam = t_default_cam()
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    spp = 16
    kw = dict(max_depth=16, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), interpret=True)
    full = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, spp, 0, k=4, **kw))
    n = W * H
    half = n // 2
    a = np.asarray(persistent_render_sum_strided(
        scene, cam, u[:half], v[:half], KEY, spp, 0, k=4, pixel_start=0, **kw))
    b = np.asarray(persistent_render_sum_strided(
        scene, cam, u[half:], v[half:], KEY, spp, 0, k=4, pixel_start=half, **kw))
    tiled = np.concatenate([a, b])
    assert np.isfinite(tiled).all()
    assert abs(tiled.mean() - full.mean()) / spp < 0.01
    assert np.abs(tiled - full).mean() / spp < 0.06


def test_strided_sample_groups_equivalence():
    # Sample-folded lanes (each lane owns one (pixel, sample-slice)) must
    # cover the same sample set as the sequential-regen layout: statistical
    # agreement, and the strip-0 threefry streams are keyed by global
    # (pixel, sample) id so group boundaries match chunk boundaries.
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = scene_2_spheres()
    cam = t_default_cam()
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    kw = dict(max_depth=16, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), interpret=True)
    seq = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 8, 0, k=1, sample_groups=1, **kw))
    folded = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 8, 0, k=1, sample_groups=4, **kw))
    assert np.isfinite(folded).all()
    assert abs(seq.mean() - folded.mean()) / 8 < 0.01
    assert np.abs(seq - folded).mean() / 8 < 0.06


def test_strided_sample_groups_mirror_exact():
    # With m == spp every lane does exactly one sample, so every camera draw
    # comes from the threefry path keyed by global (pixel, sample) — exactly
    # the stream of four 1-spp chunk calls at offsets 0..3. On an RNG-free
    # material path (fuzz-0 mirror) the folded sum is therefore bitwise the
    # chunk sum.
    from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum_strided
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    W, H = 48, 27
    u, v = pixel_coords(W, H)
    kw = dict(max_depth=8, tmin=1e-4, f32_w=float(np.float32(W)),
              f32_h=float(np.float32(H)), interpret=True)
    chunks = sum(np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 1, off, k=1, sample_groups=1, **kw))
        for off in range(4))
    folded = np.asarray(persistent_render_sum_strided(
        scene, cam, u, v, KEY, 4, 0, k=1, sample_groups=4, **kw))
    np.testing.assert_allclose(folded, chunks, atol=1e-5)
