"""Scene library — the five reference scenes as SoA builders.

Reference: src/scenes.jl:1-84. Builders return a padded :class:`Scene` pytree
instead of a ``Vector{Hittable}``; constants match the reference exactly,
including the hollow-glass *negative radius* (src/scenes.jl:35-36) and the
random-scene distribution quirks (fuzz ∈ [0,5], not the book's [0,0.5];
src/scenes.jl:70).

Scene generation randomness: the reference consumes its per-thread Xoroshiro
stream (src/scenes.jl:57-70), making "the" random scene reproducible only via
``reseed!`` + single-threaded construction (SURVEY.md §3.3). We use a seeded
NumPy Generator on the host instead — same distribution, deterministic per
seed — and support loading a serialized scene fixture for cross-implementation
parity (``save_scene``/``load_scene``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..scene import (Scene, make_scene, lambertian, metal, dielectric)


def scene_2_spheres(dtype=jnp.float32) -> Scene:
    """Two Lambertian spheres (reference: src/scenes.jl:2-11)."""
    return make_scene([
        lambertian((0, 0, -1), 0.5, (0.7, 0.3, 0.3)),
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
    ], dtype=dtype)


def scene_4_spheres(dtype=jnp.float32) -> Scene:
    """2 Lambertian + 2 Metal spheres (reference: src/scenes.jl:16-23)."""
    return make_scene([
        lambertian((0, 0, -1), 0.5, (0.7, 0.3, 0.3)),
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        metal((-1, 0, -1), 0.5, (0.8, 0.8, 0.8), 0.3),
        metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.8),
    ], dtype=dtype)


def scene_diel_spheres(left_radius: float = 0.5, dtype=jnp.float32) -> Scene:
    """Dielectric scene; ``left_radius=-0.5`` gives the hollow thin bubble
    (reference: src/scenes.jl:25-39)."""
    return make_scene([
        lambertian((0, 0, -1), 0.5, (0.1, 0.2, 0.5)),
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        dielectric((-1, 0, -1), left_radius, 1.5),
        metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.0),
    ], dtype=dtype)


def scene_diel_spheres_hollow(dtype=jnp.float32) -> Scene:
    """Solid glass shell + hollow interior via negative radius — the classic
    hollow-glass configuration (reference: src/scenes.jl:35-36 comment and the
    Pluto notebook usage)."""
    return make_scene([
        lambertian((0, 0, -1), 0.5, (0.1, 0.2, 0.5)),
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        dielectric((-1, 0, -1), 0.5, 1.5),
        dielectric((-1, 0, -1), -0.45, 1.5),
        metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.0),
    ], dtype=dtype)


def scene_blue_red_spheres(dtype=jnp.float32) -> Scene:
    """Wide-angle blue/red pair (reference: src/scenes.jl:41-47)."""
    R = math.cos(math.pi / 4)
    return make_scene([
        lambertian((-R, 0, -1), R, (0, 0, 1)),
        lambertian((R, 0, -1), R, (1, 0, 0)),
    ], dtype=dtype)


def scene_random_spheres(seed: int = 1, dtype=jnp.float32,
                         grid_half: int = 11) -> Scene:
    """Book-1 final scene: ground + 22×22 grid of random small spheres + 3 hero
    spheres, ~480 spheres total (reference: src/scenes.jl:49-84).

    Distribution matches the reference exactly: diffuse for p<0.8 with
    component-wise ``rand*rand`` albedo, metal for p<0.95 with albedo in
    [0.5,1] and fuzz in [0,5] (reference quirk, src/scenes.jl:70), else glass;
    grid cells whose jittered center lands within 0.9 of (4, 0.2, 0) are
    skipped (src/scenes.jl:61).

    ``grid_half`` shrinks the grid to ``(2*grid_half)²`` cells (default 11 =
    the reference's -11:10 loops) — e.g. ``grid_half=3`` gives a ~36-small-
    sphere scene for inverse-rendering demos where every sphere must be
    visibly resolvable at demo resolution.
    """
    g = np.random.default_rng(seed)
    spheres = [lambertian((0, -1000, -1), 1000.0, (0.5, 0.5, 0.5))]

    for a in range(-grid_half, grid_half):
        for b in range(-grid_half, grid_half):
            choose_mat = g.random()
            center = np.array([a + 0.9 * g.random(), 0.2, b + 0.9 * g.random()])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) < 0.9:
                continue
            if choose_mat < 0.8:
                albedo = g.random(3) * g.random(3)
                spheres.append(lambertian(center, 0.2, albedo))
            elif choose_mat < 0.95:
                albedo = 0.5 + 0.5 * g.random(3)
                fuzz = 5.0 * g.random()
                spheres.append(metal(center, 0.2, albedo, fuzz))
            else:
                spheres.append(dielectric(center, 0.2, 1.5))

    spheres.append(dielectric((0, 1, 0), 1.0, 1.5))
    spheres.append(lambertian((-4, 1, 0), 1.0, (0.4, 0.2, 0.1)))
    spheres.append(metal((4, 1, 0), 1.0, (0.7, 0.6, 0.5), 0.0))
    return make_scene(spheres, dtype=dtype)


def scene_random_spheres_reference(dtype=jnp.float32, warmup: int = 2,
                                   low52: bool = False) -> Scene:
    """THE reference scene instance — bit-exact replay of
    ``scene_random_spheres`` as the reference builds it after ``reseed!``
    (reference: src/scenes.jl:49-84 with trand = fresh Xoroshiro128Plus(1),
    src/proto/proto.jl:198-199, src/init.jl:8-10).

    Draw order per grid cell (src/scenes.jl:57-70, Julia evaluates arguments
    left-to-right): choose_mat, center.x jitter, center.z jitter — consumed
    even for cells skipped by the 0.9-exclusion around (4, 0.2, 0) — then
    6 draws for a diffuse albedo (rand*rand componentwise, first vector fully
    drawn before the second), or 3 + 1 for metal albedo∈[0.5,1] and
    fuzz∈[0,5], or none for glass. Grid loops run a outer, b inner over
    -11:10. The geometry is computed in float64 exactly as Julia does before
    the final cast to ``dtype``.

    ``warmup``/``low52`` expose the two RandomNumbers.jl implementation
    details the fixture test pins (see utils/xoroshiro.py).
    """
    from ..utils.xoroshiro import Xoroshiro128Plus

    rng = Xoroshiro128Plus(1, warmup=warmup, low52=low52)
    spheres = [lambertian((0, -1000, -1), 1000.0, (0.5, 0.5, 0.5))]

    for a in range(-11, 11):
        for b in range(-11, 11):
            choose_mat = rng.rand()
            cx = a + 0.9 * rng.rand()
            cz = b + 0.9 * rng.rand()
            center = np.array([cx, 0.2, cz])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) < 0.9:
                continue
            if choose_mat < 0.8:
                r1 = [rng.rand() for _ in range(3)]
                r2 = [rng.rand() for _ in range(3)]
                albedo = np.array(r1) * np.array(r2)
                spheres.append(lambertian(center, 0.2, albedo))
            elif choose_mat < 0.95:
                albedo = np.array([rng.rand_between(0.5, 1.0) for _ in range(3)])
                fuzz = rng.rand_between(0.0, 5.0)
                spheres.append(metal(center, 0.2, albedo, fuzz))
            else:
                spheres.append(dielectric(center, 0.2, 1.5))

    spheres.append(dielectric((0, 1, 0), 1.0, 1.5))
    spheres.append(lambertian((-4, 1, 0), 1.0, (0.4, 0.2, 0.1)))
    spheres.append(metal((4, 1, 0), 1.0, (0.7, 0.6, 0.5), 0.0))
    return make_scene(spheres, dtype=dtype)


def save_scene(scene: Scene, path: str) -> None:
    """Serialize a scene to ``.npz`` — the parity-fixture mechanism
    (SURVEY.md §3.3: serialized scenes beat replaying thread-scheduled RNG)."""
    np.savez(path, **{f: np.asarray(getattr(scene, f)) for f in scene._fields})


def load_scene(path: str, dtype=jnp.float32) -> Scene:
    """Load a scene serialized by :func:`save_scene`."""
    data = np.load(path)
    return Scene(
        center=jnp.asarray(data["center"], dtype=dtype),
        radius=jnp.asarray(data["radius"], dtype=dtype),
        albedo=jnp.asarray(data["albedo"], dtype=dtype),
        fuzz=jnp.asarray(data["fuzz"], dtype=dtype),
        ir=jnp.asarray(data["ir"], dtype=dtype),
        mat=jnp.asarray(data["mat"], dtype=jnp.int32),
    )


ALL_SCENES = {
    "2_spheres": scene_2_spheres,
    "4_spheres": scene_4_spheres,
    "diel_spheres": scene_diel_spheres,
    "diel_spheres_hollow": scene_diel_spheres_hollow,
    "blue_red_spheres": scene_blue_red_spheres,
    "random_spheres": scene_random_spheres,
    "random_spheres_reference": scene_random_spheres_reference,
}
