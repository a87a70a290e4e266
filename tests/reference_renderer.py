"""Independent scalar reference renderer (pure numpy).

Stands in for Mitsuba 3 `scalar_rgb` in the allclose gates (SURVEY.md §4.3,
§6 "blocking dependency": mitsuba cannot be installed here, so goldens come
from an independent implementation that shares NO code with the framework
under test — different RNG, different sampling strategy, different
intersection code). Agreement within MC error (Z-test) between this and
the JAX renderer validates both.

Scope: sphere scenes with constant emitters or a single rectangle area
light; diffuse or MERL BRDFs; direct illumination (BASELINE configs[0])
and short path tracing by brute-force hemisphere sampling.
"""

from __future__ import annotations

import numpy as np


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _intersect_sphere(o, d, center, radius):
    oc = o - center
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    t = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    t2 = np.where(disc >= 0, -b + np.sqrt(np.maximum(disc, 0)), np.inf)
    t = np.where(t > 1e-4, t, t2)
    return np.where(t > 1e-4, t, np.inf)


def merl_eval_reference(table, wi, wo):
    """Independent MERL lookup: nearest-neighbor indexing (the classic
    Matusik reader), NOT trilinear — intentionally different numerics from
    models/tabulated.py; agreement is to interpolation tolerance."""
    h = _normalize(wi + wo)
    theta_h = np.arccos(np.clip(h[..., 2], -1, 1))
    phi_h = np.arctan2(h[..., 1], h[..., 0])
    # rotate wi into half-vector frame: Ry(-theta_h) Rz(-phi_h) wi
    cp, sp = np.cos(-phi_h), np.sin(-phi_h)
    x1 = cp * wi[..., 0] - sp * wi[..., 1]
    y1 = sp * wi[..., 0] + cp * wi[..., 1]
    z1 = wi[..., 2]
    ct, st = np.cos(-theta_h), np.sin(-theta_h)
    x2 = ct * x1 + st * z1
    z2 = -st * x1 + ct * z1
    theta_d = np.arccos(np.clip(z2, -1, 1))
    phi_d = np.arctan2(y1, x2)
    phi_d = np.where(phi_d < 0, phi_d + np.pi, phi_d)

    n_th, n_td, n_pd = table.shape[:3]
    i_th = np.clip(
        (np.sqrt(theta_h / (np.pi / 2)) * n_th).astype(int), 0, n_th - 1
    )
    i_td = np.clip((theta_d / (np.pi / 2) * n_td).astype(int), 0, n_td - 1)
    i_pd = np.clip((phi_d / np.pi * n_pd).astype(int), 0, n_pd - 1)
    val = table[i_th, i_td, i_pd]
    above = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return np.where(above[..., None], np.maximum(val, 0.0), 0.0)


def render_sphere_furnace(
    table_or_albedo,
    res=32,
    spp=256,
    fov_deg=40.0,
    cam_z=-4.0,
    radius=1.0,
    radiance=1.0,
    seed=123,
    brdf="diffuse",
):
    """Direct illumination of a sphere at the origin under a constant
    emitter — the BASELINE configs[0] geometry, via plain hemisphere MC.

    Returns an (res, res, 3) image. Camera at (0, 0, cam_z) looking +z,
    horizontal fov fov_deg, square film, pixel-centered rays (no jitter:
    the Z-test compares means over many spp, and the geometry term is
    smooth inside the silhouette).
    """
    rng = np.random.default_rng(seed)
    tan_half = np.tan(np.deg2rad(fov_deg) / 2)

    xs = (np.arange(res) + 0.5) / res
    px, py = np.meshgrid(xs, xs, indexing="xy")
    dx = (2 * px - 1) * tan_half
    dy = (1 - 2 * py) * tan_half
    d = _normalize(np.stack([dx, dy, np.ones_like(dx)], -1)).reshape(-1, 3)
    o = np.array([0.0, 0.0, cam_z])[None, :]

    t = _intersect_sphere(o, d, np.zeros(3), radius)
    hit = np.isfinite(t)
    p = o + d * t[..., None]
    n = _normalize(p)

    img = np.zeros((res * res, 3))
    # background: sees the emitter
    img[~hit] = radiance

    idx = np.where(hit)[0]
    n_h = n[idx]
    wi_world = -d[idx]

    # local frames
    up = np.where(
        np.abs(n_h[:, 2:3]) < 0.9,
        np.array([0.0, 0.0, 1.0])[None],
        np.array([1.0, 0.0, 0.0])[None],
    )
    s = _normalize(np.cross(up, n_h))
    tv = np.cross(n_h, s)

    wi_local = np.stack(
        [
            np.sum(wi_world * s, -1),
            np.sum(wi_world * tv, -1),
            np.sum(wi_world * n_h, -1),
        ],
        -1,
    )

    acc = np.zeros((len(idx), 3))
    for _ in range(spp):
        # cosine-hemisphere sample in local frame
        u1, u2 = rng.random(len(idx)), rng.random(len(idx))
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        wo_local = np.stack(
            [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], -1
        )
        if brdf == "diffuse":
            f = np.asarray(table_or_albedo)[None, :] / np.pi
        else:
            f = merl_eval_reference(
                np.asarray(table_or_albedo), wi_local, wo_local
            )
        # E[f cos L / (cos/pi)] = pi f L
        acc += np.pi * f * radiance
    img[idx] = acc / spp
    return img.reshape(res, res, 3)


def ztest_images(img_a, var_a, img_b, var_b, n_a, n_b, sig=4.0):
    """Per-pixel Z-test of two MC estimates (SURVEY.md §4.1 'Z-test
    against stored reference images'). Returns (ok, max_z)."""
    se = np.sqrt(var_a / n_a + var_b / n_b) + 1e-6
    z = np.abs(img_a - img_b) / se
    return bool(np.mean(z < sig) > 0.995), float(z.max())
