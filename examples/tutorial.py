"""Chaptered walkthrough of the framework — the role the reference's Pluto
notebook plays (reference: src/pluto_RayTracingWeekend.jl, chapter headers at
:32,:40,:87,:209,:253,:280), rebuilt as a runnable script. Each chapter prints
what it demonstrates and writes an image next to this file.

Run:  python examples/tutorial.py [--width 200] [--spp 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.utils.image import write_png

HERE = os.path.dirname(os.path.abspath(__file__))


def out(name):
    return os.path.join(HERE, name)


def chapter(n, title):
    print(f"\n=== Chapter {n}: {title} ===")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--spp", type=int, default=16)
    args = ap.parse_args()
    W, spp = args.width, args.spp

    chapter(1, "Rays and the sky")
    # A camera at the origin; an empty scene renders the sky gradient
    # (reference: skycolor, src/ray_color.jl:1-6).
    empty = rtw.make_scene([])
    cam = rtw.t_default_cam()
    img = rtw.render(empty, cam, W, 1)
    write_png(np.asarray(img), out("ch1_sky.png"))
    print("sky gradient ->", out("ch1_sky.png"))

    chapter(2, "A sphere and surface normals")
    # One Lambertian sphere + ground (reference: scene_2_spheres, src/scenes.jl:2-11).
    scene = rtw.scene_2_spheres()
    img = rtw.render(scene, cam, W, spp)
    write_png(np.asarray(img), out("ch2_two_spheres.png"))
    print("diffuse spheres ->", out("ch2_two_spheres.png"))

    chapter(3, "Metal with fuzz")
    scene = rtw.scene_4_spheres()
    img = rtw.render(scene, cam, W, spp)
    write_png(np.asarray(img), out("ch3_metal.png"))
    print("metal spheres ->", out("ch3_metal.png"))

    chapter(4, "Dielectrics and the hollow glass sphere")
    # Negative radius = thin shell (reference: src/scenes.jl:35-36).
    scene = rtw.scene_diel_spheres_hollow()
    img = rtw.render(scene, rtw.hollow_glass_cam(), W, spp)
    write_png(np.asarray(img), out("ch4_glass.png"))
    print("hollow glass ->", out("ch4_glass.png"))

    chapter(5, "Defocus blur")
    scene = rtw.scene_diel_spheres()
    img = rtw.render(scene, rtw.t_cam2(), W, spp)
    write_png(np.asarray(img), out("ch5_defocus.png"))
    print("defocus blur ->", out("ch5_defocus.png"))

    chapter(6, "The book-1 final scene")
    scene = rtw.scene_random_spheres(seed=1)
    t0 = time.time()
    img = rtw.render(scene, rtw.t_cam1(), W, spp, persistent=True)
    img = np.asarray(img)
    print(f"rendered {W}x{W*9//16}x{spp} in {time.time()-t0:.2f}s")
    write_png(img, out("ch6_random_spheres.png"))
    print("final scene ->", out("ch6_random_spheres.png"))

    chapter(7, "Differentiable rendering (no reference equivalent)")
    # Recover a sphere albedo from a target image by gradient descent.
    from raytracingweekend_jl_tpu.grad import sgd_inverse_render_step
    cam = rtw.t_default_cam()
    target_scene = rtw.make_scene(
        [rtw.lambertian((0, 0, -1), 0.5, (0.2, 0.8, 0.3)),
         rtw.lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0))], pad_to=4)
    target = rtw.render_radiance(target_scene, cam, 64, 4, seed=3)
    scene = rtw.make_scene(
        [rtw.lambertian((0, 0, -1), 0.5, (0.5, 0.5, 0.5)),
         rtw.lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0))], pad_to=4)
    for i in range(10):
        loss, scene = sgd_inverse_render_step(scene, cam, target, 64, 4,
                                              lr=2.0, seed=3)
        if i % 3 == 0:
            print(f"  step {i}: loss {float(loss):.6f} "
                  f"albedo {np.asarray(scene.albedo[0]).round(3)}")
    print("  true albedo: [0.2 0.8 0.3]")

    chapter(8, "Sharded rendering on a device mesh")
    n = len(jax.devices())
    from raytracingweekend_jl_tpu.parallel.mesh import make_render_mesh
    from raytracingweekend_jl_tpu.parallel.shard import render_radiance_sharded
    mesh = make_render_mesh(n_tiles=n)
    img = render_radiance_sharded(rtw.scene_2_spheres(), cam, 64, 4, mesh=mesh,
                                  tile_size=256)
    print(f"rendered on a {n}-device mesh:", np.asarray(img).shape)

    chapter(9, "The reference's exact scene (Xoroshiro replay)")
    # The scene instance the reference's own `reseed!(); scene_random_spheres`
    # produces, replayed bit-exactly in Python (docs/PARITY.md section 4).
    ref_scene = rtw.scene_random_spheres_reference()
    mats = np.asarray(ref_scene.mat)[np.asarray(ref_scene.radius) != 0]
    print(f"  {mats.size} spheres: "
          f"{(mats == 0).sum()} diffuse / {(mats == 1).sum()} metal / "
          f"{(mats == 2).sum()} glass")

    chapter(10, "Elastic rendering (survives device faults)")
    from raytracingweekend_jl_tpu.parallel.elastic import render_radiance_elastic
    img = render_radiance_elastic(rtw.scene_2_spheres(), cam, 64, 2,
                                  tile_size=256, seed=1)
    print("  elastic per-tile render:", np.asarray(img).shape)


if __name__ == "__main__":
    main()
