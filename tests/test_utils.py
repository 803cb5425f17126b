"""Infra tests: image IO, checkpoint/resume sample-exactness, config/CLI."""

import json
import os

import numpy as np
import pytest

from raytracingweekend_jl_tpu import scene_2_spheres, t_default_cam, render_radiance
from raytracingweekend_jl_tpu.utils.image import (to_uint8, write_png, write_ppm,
                                                  read_png, _write_png_pure)
from raytracingweekend_jl_tpu.utils.checkpoint import (render_checkpointed,
                                                       save_state, load_state,
                                                       RenderState)
from raytracingweekend_jl_tpu.utils.config import RenderConfig
from raytracingweekend_jl_tpu.utils.metrics import throughput_record, PhaseTimer


def test_to_uint8_rounding():
    img = np.array([[[0.0, 0.5, 1.0]]])
    np.testing.assert_array_equal(to_uint8(img)[0, 0], [0, 128, 255])


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 24, 3))
    p = str(tmp_path / "x.png")
    write_png(img, p)
    back = read_png(p)
    np.testing.assert_allclose(back, to_uint8(img) / 255.0, atol=1e-7)


def test_pure_png_matches_pil(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (8, 8, 3))
    p = str(tmp_path / "pure.png")
    _write_png_pure(to_uint8(img), p)
    back = read_png(p)
    np.testing.assert_allclose(back, to_uint8(img) / 255.0, atol=1e-7)


def test_ppm_write(tmp_path):
    img = np.zeros((4, 6, 3))
    p = str(tmp_path / "x.ppm")
    write_ppm(img, p)
    data = open(p, "rb").read()
    assert data.startswith(b"P6\n6 4\n255\n")
    assert len(data) == len(b"P6\n6 4\n255\n") + 4 * 6 * 3


def test_checkpoint_resume_sample_exact(tmp_path):
    scene = scene_2_spheres()
    cam = t_default_cam()
    ck = str(tmp_path / "state.npz")

    # Uninterrupted chunked run (2 chunks of 4).
    full = render_checkpointed(scene, cam, 48, 8, seed=5, spp_chunk=4,
                               compact=False)
    # Interrupted after chunk 1, then resume for the rest (same spp_chunk).
    render_checkpointed(scene, cam, 48, 4, seed=5, spp_chunk=4,
                        checkpoint_path=ck, compact=False)
    resumed = render_checkpointed(scene, cam, 48, 8, seed=5, spp_chunk=4,
                                  checkpoint_path=ck, compact=False)
    assert resumed.samples_done == 8
    np.testing.assert_allclose(resumed.image, full.image, atol=1e-6)


def test_checkpoint_rejects_mismatched_config(tmp_path):
    scene = scene_2_spheres()
    cam = t_default_cam()
    ck = str(tmp_path / "state.npz")
    render_checkpointed(scene, cam, 48, 2, seed=5, spp_chunk=2, checkpoint_path=ck)
    with pytest.raises(ValueError, match="configuration"):
        render_checkpointed(scene, cam, 64, 2, seed=5, spp_chunk=2,
                            checkpoint_path=ck)


def test_state_roundtrip(tmp_path):
    st = RenderState(np.ones((2, 3, 3)), 7, 3, 2, 9)
    p = str(tmp_path / "s.npz")
    save_state(st, p)
    st2 = load_state(p)
    assert st2.samples_done == 7 and st2.seed == 9
    np.testing.assert_array_equal(st2.radiance_sum, st.radiance_sum)


def test_config_builders():
    cfg = RenderConfig(scene="2_spheres", camera="default", image_width=64,
                       n_samples=2)
    scene = cfg.build_scene()
    cam = cfg.build_camera()
    img = render_radiance(scene, cam, cfg.image_width, cfg.n_samples)
    assert img.shape == (36, 64, 3)


def test_cli_end_to_end(tmp_path):
    from raytracingweekend_jl_tpu.cli import build_parser, config_from_args, run
    out = str(tmp_path / "out.png")
    args = build_parser().parse_args(
        ["--scene", "2_spheres", "--camera", "default", "--width", "48",
         "--spp", "2", "-o", out])
    os.chdir(tmp_path)  # bench_history.jsonl lands here
    rec = run(config_from_args(args))
    assert os.path.exists(out)
    assert rec["paths"] == 48 * 27 * 2
    hist = [json.loads(l) for l in open(tmp_path / "bench_history.jsonl")]
    assert hist[-1]["label"].startswith("2_spheres_48x27")


def test_cli_chunked_reports_phases(tmp_path):
    # Per-phase observability (SURVEY.md §5): the chunked CLI path must report
    # trace/fetch timings in its throughput record.
    from raytracingweekend_jl_tpu.cli import build_parser, config_from_args, run
    out = str(tmp_path / "out.png")
    args = build_parser().parse_args(
        ["--scene", "2_spheres", "--camera", "default", "--width", "48",
         "--spp", "4", "--spp-chunk", "2", "-o", out])
    os.chdir(tmp_path)
    rec = run(config_from_args(args))
    assert "phases" in rec
    assert rec["phases"].get("trace", 0) > 0
    assert "fetch" in rec["phases"]


def test_metrics_helpers():
    rec = throughput_record("x", 2.0, 4_000_000)
    assert rec["mpaths_per_s"] == 2.0
    t = PhaseTimer()
    t.start("a"); t.stop("a")
    assert "a" in t.as_dict()


def test_checkpoint_retries_transient_failure(tmp_path, monkeypatch):
    # One transient chunk failure must not lose committed progress.
    import raytracingweekend_jl_tpu.utils.checkpoint as ck
    scene = scene_2_spheres()
    cam = t_default_cam()

    calls = {"n": 0}
    real_jit = ck.jax.jit

    def flaky_jit(fn, **kw):
        jitted = real_jit(fn, **kw)

        def wrapper(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated device fault")
            return jitted(*a, **k)

        return wrapper

    monkeypatch.setattr(ck.jax, "jit", flaky_jit)
    state = ck.render_checkpointed(scene, cam, 48, 4, seed=7, spp_chunk=2,
                                   compact=False)
    assert state.samples_done == 4
    assert np.isfinite(state.image).all()
    assert calls["n"] >= 3  # chunk1 ok, chunk2 failed once then retried


def test_cli_sharded_path(tmp_path):
    # mesh_tiles > 1 routes through the shard_map driver.
    from raytracingweekend_jl_tpu.cli import run
    from raytracingweekend_jl_tpu.utils.config import RenderConfig
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    os.chdir(tmp_path)
    out = str(tmp_path / "sharded.png")
    cfg = RenderConfig(scene="2_spheres", camera="default", image_width=64,
                       n_samples=2, mesh_tiles=4, tile_size=256, output=out)
    rec = run(cfg)
    assert os.path.exists(out)
    assert rec["paths"] == 64 * 36 * 2


def test_cli_stats_flag(capsys, tmp_path):
    from raytracingweekend_jl_tpu.cli import main
    os.chdir(tmp_path)
    main(["--scene", "2_spheres", "--camera", "default", "--width", "48",
          "--spp", "1", "--no-persistent", "--stats",
          "-o", str(tmp_path / "s.png")])
    out = capsys.readouterr().out
    assert "bounce_occupancy" in out and "mean_path_length" in out


def test_cli_rejects_unknown_scene():
    from raytracingweekend_jl_tpu.cli import build_parser
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--scene", "nonexistent"])
