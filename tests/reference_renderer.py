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


def merl_eval_trilinear_reference(table, wi, wo):
    """Independent trilinear MERL lookup (numpy; same spec as the plugin,
    written against SURVEY.md §2.1's index semantics, sharing no code with
    models/tabulated.py). Used by the multi-bounce anchor where
    nearest-neighbor aliasing on specular peaks would defeat the Z-test."""
    h = _normalize(wi + wo)
    theta_h = np.arccos(np.clip(h[..., 2], -1, 1))
    phi_h = np.arctan2(h[..., 1], h[..., 0])
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
    u = np.sqrt(np.maximum(theta_h / (np.pi / 2), 0)) * n_th - 0.5
    v = theta_d / (np.pi / 2) * n_td - 0.5
    w = phi_d / np.pi * n_pd - 0.5
    i0 = np.floor(u).astype(int)
    j0 = np.floor(v).astype(int)
    k0 = np.floor(w).astype(int)
    fu, fv, fw = u - i0, v - j0, w - k0
    i0c, i1c = np.clip(i0, 0, n_th - 1), np.clip(i0 + 1, 0, n_th - 1)
    j0c, j1c = np.clip(j0, 0, n_td - 1), np.clip(j0 + 1, 0, n_td - 1)
    k0c, k1c = np.mod(k0, n_pd), np.mod(k0 + 1, n_pd)
    out = 0.0
    for di, ic, wu in ((0, i0c, 1 - fu), (1, i1c, fu)):
        for dj, jc, wv in ((0, j0c, 1 - fv), (1, j1c, fv)):
            c0 = table[ic, jc, k0c] * (1 - fw)[..., None]
            c1 = table[ic, jc, k1c] * fw[..., None]
            out = out + (wu * wv)[..., None] * (c0 + c1)
    above = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return np.where(above[..., None], np.maximum(out, 0.0), 0.0)


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


# ---------------------------------------------------------------------------
# Multi-bounce MIS path tracer (configs 1-2 anchor — round-2 verdict item 5)
# ---------------------------------------------------------------------------


def fresnel_conductor_reference(cos_i, eta, k):
    """Unpolarized conductor Fresnel (textbook form), per channel."""
    c2 = cos_i * cos_i
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2[..., None]
    a2b2 = np.sqrt(np.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2[..., None]
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * cos_i[..., None]
    rs = (t1 - t2) / (t1 + t2 + 1e-12)
    t3 = c2[..., None] * a2b2 + s2[..., None] * s2[..., None]
    t4 = t2 * s2[..., None]
    rp = rs * (t3 - t4) / (t3 + t4 + 1e-12)
    return 0.5 * (rs + rp)


def ggx_eval_reference(alpha, eta, k, spec, wi, wo):
    """Isotropic GGX roughconductor f*cos_o (local frame), numpy."""
    ci = wi[..., 2]
    co = wo[..., 2]
    h = _normalize(wi + wo)
    a2 = alpha * alpha
    d = a2 / (np.pi * ((a2 - 1.0) * h[..., 2] ** 2 + 1.0) ** 2 + 1e-20)

    def g1(v):
        c = np.maximum(v[..., 2], 1e-6)
        t2 = (1.0 - c * c) / (c * c)
        return 2.0 / (1.0 + np.sqrt(1.0 + a2 * t2))

    g = g1(wi) * g1(wo)
    f = fresnel_conductor_reference(
        np.abs(np.sum(wi * h, -1)), np.asarray(eta), np.asarray(k)
    )
    val = np.asarray(spec) * f * (d * g / np.maximum(4.0 * ci, 1e-9))[..., None]
    return np.where((ci > 0)[..., None] & (co > 0)[..., None], val, 0.0)


def make_blob_mesh(n_sub=2, bump=0.18, seed=0):
    """Deterministic displaced icosphere — the matpreview-class test object.

    Returns (vertices (V,3) float32, faces (F,3) int32)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    v = _normalize(v)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(n_sub):
        mid = {}
        nv = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                p = _normalize((v[a] + v[b])[None])[0]
                mid[key] = len(nv)
                nv.append(p)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf, np.int64)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.arctan2(v[:, 1], v[:, 0])
    r = 1.0 + bump * np.sin(3.0 * theta) * np.cos(2.0 * phi)
    v = v * r[:, None]
    return v.astype(np.float32), f.astype(np.int32)


def _intersect_tris(o, d, p0, e1, e2):
    """(N,3) rays x (P,3) tris -> (t (N,), prim (N,)) nearest; inf on miss."""
    ov = o[:, None, :]
    dv = d[:, None, :]
    pvec = np.cross(dv, e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv = 1.0 / np.where(np.abs(det) > 1e-9, det, 1.0)
    tvec = ov - p0[None]
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1[None])
    vv = np.sum(dv * qvec, -1) * inv
    t = np.sum(e2[None] * qvec, -1) * inv
    hit = (
        (np.abs(det) > 1e-9) & (u >= 0) & (vv >= 0) & (u + vv <= 1)
        & (t > 1e-4)
    )
    t = np.where(hit, t, np.inf)
    prim = np.argmin(t, axis=1)
    return t[np.arange(len(t)), prim], prim


class PathScene:
    """Scene for the reference path tracer: one triangle soup with per-tri
    material ids + an emissive rectangle (given as 2 of the triangles)."""

    def __init__(self, p0, e1, e2, mat_id, emissive, light_rad, materials):
        self.p0, self.e1, self.e2 = p0, e1, e2
        self.mat_id = mat_id
        self.emissive = emissive  # (P,) bool
        self.light_rad = np.asarray(light_rad, np.float64)
        self.materials = materials  # list of dicts
        n = np.cross(e1, e2)
        self.tri_area = 0.5 * np.linalg.norm(n, axis=-1)
        self.tri_n = _normalize(n)
        self.light_ids = np.where(emissive)[0]
        self.light_area = float(self.tri_area[self.light_ids].sum())

    def eval_brdf(self, mid, wi, wo):
        """f*cos_o per lane (local frame), dispatch over materials."""
        out = np.zeros(wi.shape[:-1] + (3,))
        co = np.maximum(wo[..., 2], 0.0)
        for i, mat in enumerate(self.materials):
            sel = mid == i
            if not sel.any():
                continue
            if mat["type"] == "diffuse":
                out[sel] = np.asarray(mat["albedo"]) / np.pi * co[sel][:, None]
            elif mat["type"] == "ggx":
                out[sel] = ggx_eval_reference(
                    mat["alpha"], mat["eta"], mat["k"],
                    mat.get("spec", [1.0, 1.0, 1.0]), wi[sel], wo[sel],
                )
            elif mat["type"] == "merl":
                f = merl_eval_trilinear_reference(
                    mat["table"], wi[sel], wo[sel]
                )
                out[sel] = f * co[sel][:, None]
        return out


def render_path_reference(scene: PathScene, cam, res, spp, max_depth,
                          seed=0):
    """Multi-bounce NEE+MIS path tracer, cosine-hemisphere BSDF sampling.

    Independent estimator from the framework under test (different RNG,
    different BSDF sampling strategy, different MIS pairing code). Returns
    (mean (res,res,3), var (res,res,3)) over spp samples per pixel.
    """
    rng = np.random.default_rng(seed)
    origin = np.asarray(cam["origin"], np.float64)
    fwd = _normalize(np.asarray(cam["target"], np.float64) - origin)
    upv = np.asarray(cam.get("up", [0, 1, 0]), np.float64)
    right = _normalize(np.cross(upv, fwd))
    up2 = np.cross(fwd, right)
    tan_half = np.tan(np.deg2rad(cam.get("fov", 40.0)) / 2)

    npix = res * res
    acc = np.zeros((npix, 3))
    acc2 = np.zeros((npix, 3))
    xs = (np.arange(res) + 0.5) / res
    px, py = np.meshgrid(xs, xs, indexing="xy")

    for s in range(spp):
        jx = (rng.random(px.shape) - 0.5) / res
        jy = (rng.random(px.shape) - 0.5) / res
        x = (2 * (px + jx) - 1) * tan_half
        y = (1 - 2 * (py + jy)) * tan_half
        d = _normalize(
            x.reshape(-1, 1) * right[None]
            + y.reshape(-1, 1) * up2[None]
            + fwd[None]
        )
        o = np.broadcast_to(origin, d.shape).copy()
        thr = np.ones((npix, 3))
        L = np.zeros((npix, 3))
        active = np.ones(npix, bool)
        prev_pdf = np.zeros(npix)
        prev_delta = np.ones(npix, bool)  # camera rays

        for depth in range(max_depth):
            t, prim = _intersect_tris(o, d, scene.p0, scene.e1, scene.e2)
            hit = np.isfinite(t) & active
            # emissive hits (MIS against previous NEE)
            em_hit = hit & scene.emissive[prim]
            if em_hit.any():
                idx = np.where(em_hit)[0]
                pr = prim[idx]
                n_l = scene.tri_n[pr]
                # front face only
                front = np.sum(n_l * d[idx], -1) < 0
                dist2 = t[idx] ** 2
                cos_l = np.abs(np.sum(n_l * d[idx], -1))
                pdf_area = 1.0 / scene.light_area
                pdf_sa = pdf_area * dist2 / np.maximum(cos_l, 1e-9)
                w = np.where(
                    prev_delta[idx], 1.0,
                    prev_pdf[idx] ** 2
                    / np.maximum(prev_pdf[idx] ** 2 + pdf_sa ** 2, 1e-20),
                )
                L[idx] += np.where(
                    front[:, None], thr[idx] * scene.light_rad[None] * w[:, None],
                    0.0,
                )
            active = hit & ~scene.emissive[prim]
            if not active.any():
                break
            idx = np.where(active)[0]
            pr = prim[idx]
            p_hit = o[idx] + d[idx] * t[idx][:, None]
            n_g = scene.tri_n[pr]
            # two-sided shading frame facing the incoming ray
            flip = np.sum(n_g * d[idx], -1) > 0
            n_sh = np.where(flip[:, None], -n_g, n_g)
            upl = np.where(
                np.abs(n_sh[:, 2:3]) < 0.9,
                np.array([0.0, 0.0, 1.0])[None],
                np.array([1.0, 0.0, 0.0])[None],
            )
            sv = _normalize(np.cross(upl, n_sh))
            tv = np.cross(n_sh, sv)

            def to_local(vec):
                return np.stack(
                    [np.sum(vec * sv, -1), np.sum(vec * tv, -1),
                     np.sum(vec * n_sh, -1)], -1,
                )

            wi_l = to_local(-d[idx])
            mid = scene.mat_id[pr]

            # --- NEE: uniform point on the light triangles ---
            if depth + 2 <= max_depth:
                li = scene.light_ids[
                    rng.integers(0, len(scene.light_ids), len(idx))
                ]
                u1, u2v = rng.random(len(idx)), rng.random(len(idx))
                su = np.sqrt(u1)
                b0, b1 = 1 - su, u2v * su
                p_l = (
                    scene.p0[li] + b0[:, None] * scene.e1[li]
                    + b1[:, None] * scene.e2[li]
                )
                dl = p_l - p_hit
                dist = np.linalg.norm(dl, axis=-1)
                dl = dl / np.maximum(dist[:, None], 1e-9)
                cos_l = np.maximum(-np.sum(scene.tri_n[li] * dl, -1), 0.0)
                pdf_sa = (
                    (1.0 / scene.light_area) * dist ** 2
                    / np.maximum(cos_l, 1e-9)
                )
                wo_l = to_local(dl)
                f = scene.eval_brdf(mid, wi_l, wo_l)
                # shadow
                t_s, pr_s = _intersect_tris(
                    p_hit + 1e-4 * np.where(
                        (np.sum(dl * n_g, -1) >= 0)[:, None], n_g, -n_g
                    ),
                    dl, scene.p0, scene.e1, scene.e2,
                )
                unocc = (t_s >= dist - 1e-3) | scene.emissive[pr_s] & (
                    np.abs(t_s - dist) < 1e-2
                )
                vis = (cos_l > 0) & (wo_l[..., 2] > 0) & unocc
                pdf_b = np.maximum(wo_l[..., 2], 0.0) / np.pi
                w = pdf_sa ** 2 / np.maximum(pdf_sa ** 2 + pdf_b ** 2, 1e-20)
                L[idx] += np.where(
                    vis[:, None],
                    thr[idx] * f * scene.light_rad[None]
                    * (w / np.maximum(pdf_sa, 1e-9))[:, None],
                    0.0,
                )

            # --- cosine continuation ---
            u1, u2v = rng.random(len(idx)), rng.random(len(idx))
            r_ = np.sqrt(u1)
            ph = 2 * np.pi * u2v
            wo_l = np.stack(
                [r_ * np.cos(ph), r_ * np.sin(ph), np.sqrt(1 - u1)], -1
            )
            f = scene.eval_brdf(mid, wi_l, wo_l)
            pdf_b = np.maximum(wo_l[..., 2], 1e-9) / np.pi
            thr[idx] = thr[idx] * f / pdf_b[:, None]
            d_new = (
                wo_l[:, 0:1] * sv + wo_l[:, 1:2] * tv + wo_l[:, 2:3] * n_sh
            )
            o[idx] = p_hit + 1e-4 * np.where(
                (np.sum(d_new * n_g, -1) >= 0)[:, None], n_g, -n_g
            )
            d[idx] = d_new
            prev_pdf[idx] = pdf_b
            prev_delta[idx] = False
            cont = np.zeros(npix, bool)
            cont[idx] = (depth + 1 < max_depth) & (thr[idx].max(-1) > 0)
            active = cont

        acc += L
        acc2 += L * L

    mean = acc / spp
    var = np.maximum(acc2 / spp - mean * mean, 0.0)
    return mean.reshape(res, res, 3), var.reshape(res, res, 3)
