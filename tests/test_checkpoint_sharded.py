"""Checkpoint/resume COMPOSED with the mesh-sharded driver (round-4 verdict
Missing #3: `render_checkpointed` drove only the single-device path and the
CLI made multihost / spp-chunk / mesh branches mutually exclusive — a
flagship pod render could not both shard and resume). SURVEY.md §5:
'multi-host render restartable from tile checkpoint'."""

import os

import jax
import numpy as np
import pytest

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.parallel.mesh import make_render_mesh
from raytracingweekend_jl_tpu.parallel.shard import render_radiance_sharded
from raytracingweekend_jl_tpu.utils.checkpoint import (
    render_checkpointed_sharded, load_strip_state)

W, H, TILE = 64, 32, 256


def _mesh(n_tiles=4, n_samples=2):
    return make_render_mesh(n_tiles=n_tiles, n_samples=n_samples,
                            devices=jax.devices()[:n_tiles * n_samples])


def test_sharded_checkpoint_resume_bitwise(tmp_path):
    """Interrupt + resume == one uninterrupted chunked run, bitwise — the
    single-device sample-exactness contract extended over the mesh."""
    scene = rtw.ALL_SCENES["4_spheres"]()
    cam = rtw.t_default_cam()
    mesh = _mesh()
    ck = str(tmp_path / "ck.npz")

    full = render_checkpointed_sharded(scene, cam, W, 8, mesh=mesh,
                                       image_height=H, spp_chunk=2,
                                       tile_size=TILE, seed=5)
    part = render_checkpointed_sharded(scene, cam, W, 2, mesh=mesh,
                                       image_height=H, spp_chunk=2,
                                       tile_size=TILE, seed=5,
                                       checkpoint_path=ck)
    assert part.samples_done == 2
    assert os.path.exists(ck)
    resumed = render_checkpointed_sharded(scene, cam, W, 8, mesh=mesh,
                                          image_height=H, spp_chunk=2,
                                          tile_size=TILE, seed=5,
                                          checkpoint_path=ck)
    assert resumed.samples_done == 8
    np.testing.assert_array_equal(full.image, resumed.image)

    # The disk state equals the returned state (resume reads what was saved).
    disk = load_strip_state(ck)
    np.testing.assert_array_equal(disk.strip_sum, resumed.strip_sum)
    assert disk.samples_done == 8


def test_sharded_checkpoint_matches_direct_render():
    """Chunked accumulation equals the one-shot sharded mean render up to
    float summation order."""
    scene = rtw.ALL_SCENES["2_spheres"]()
    cam = rtw.t_default_cam()
    mesh = _mesh()
    state = render_checkpointed_sharded(scene, cam, W, 4, mesh=mesh,
                                        image_height=H, spp_chunk=2,
                                        tile_size=TILE, seed=3)
    direct = np.asarray(render_radiance_sharded(
        scene, cam, W, 4, mesh=mesh, image_height=H, tile_size=TILE, seed=3))
    np.testing.assert_allclose(state.image, direct, atol=5e-7)


def test_sharded_checkpoint_rejects_mismatched_config(tmp_path):
    scene = rtw.ALL_SCENES["2_spheres"]()
    cam = rtw.t_default_cam()
    mesh = _mesh()
    ck = str(tmp_path / "ck.npz")
    render_checkpointed_sharded(scene, cam, W, 2, mesh=mesh, image_height=H,
                                spp_chunk=2, tile_size=TILE, seed=5,
                                checkpoint_path=ck)
    with pytest.raises(ValueError, match="does not match"):
        render_checkpointed_sharded(scene, cam, W, 2, mesh=mesh,
                                    image_height=H, spp_chunk=2,
                                    tile_size=TILE, seed=6,
                                    checkpoint_path=ck)


def test_sharded_checkpoint_rejects_bad_spp_chunk():
    scene = rtw.ALL_SCENES["2_spheres"]()
    cam = rtw.t_default_cam()
    mesh = _mesh(n_tiles=4, n_samples=2)
    with pytest.raises(ValueError, match="multiples of the mesh sample"):
        render_checkpointed_sharded(scene, cam, W, 4, mesh=mesh,
                                    image_height=H, spp_chunk=3,
                                    tile_size=TILE, seed=0)


def test_cli_mesh_spp_chunk_checkpoint_composes(tmp_path, monkeypatch):
    """--mesh-tiles + --spp-chunk + --checkpoint in ONE invocation (the
    branches used to be mutually exclusive), including a resume that only
    renders the remaining samples."""
    from raytracingweekend_jl_tpu.cli import main
    monkeypatch.chdir(tmp_path)  # bench_history.jsonl lands here
    out = str(tmp_path / "img.png")
    ck = str(tmp_path / "ck.npz")
    args = ["--scene", "2_spheres", "--width", "64", "--height", "32",
            "--spp", "4", "--spp-chunk", "2", "--checkpoint", ck,
            "--mesh-tiles", "4", "--mesh-samples", "2",
            "--tile-size", "256", "-o", out]
    main(args)
    assert os.path.exists(out) and os.path.exists(ck)
    st = load_strip_state(ck)
    assert st.samples_done == 4
    img_once = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                          .open(out)).copy()

    # Re-running with a satisfied checkpoint renders nothing new and writes
    # the identical image.
    main(args)
    img_again = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                           .open(out))
    np.testing.assert_array_equal(img_once, img_again)


def test_sharded_checkpoint_rejects_changed_chunking(tmp_path):
    """spp_chunk/tile_size are part of the bitwise-resume contract (chunk
    offsets key the RNG; tiles key the strip layout) — resuming with
    different values must fail UP FRONT, not after a wasted chunk."""
    scene = rtw.ALL_SCENES["2_spheres"]()
    cam = rtw.t_default_cam()
    mesh = _mesh()
    ck = str(tmp_path / "ck.npz")
    render_checkpointed_sharded(scene, cam, W, 2, mesh=mesh, image_height=H,
                                spp_chunk=2, tile_size=TILE, seed=5,
                                checkpoint_path=ck)
    with pytest.raises(ValueError, match="spp_chunk"):
        render_checkpointed_sharded(scene, cam, W, 4, mesh=mesh,
                                    image_height=H, spp_chunk=4,
                                    tile_size=TILE, seed=5,
                                    checkpoint_path=ck)
    with pytest.raises(ValueError, match="tile_size"):
        render_checkpointed_sharded(scene, cam, W, 4, mesh=mesh,
                                    image_height=H, spp_chunk=2,
                                    tile_size=128, seed=5,
                                    checkpoint_path=ck)
