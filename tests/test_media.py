"""Participating-media tests: phase functions, free-flight estimators,
and volumetric end-to-end renders.

Mirrors the reference's test strategy (SURVEY.md §4.1): chi2 sampling
gates on phase functions (mitsuba3 src/phase/tests/) + analytic
transmittance checks on media (src/media/tests) + render-level checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.models import phase
from mitsuba_customization_tpu.render import medium as med
from mitsuba_customization_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

WI = np.asarray([0.3, -0.2, 0.933], np.float32)
WI = WI / np.linalg.norm(WI)


def _chi2_phase(g, n=120_000):
    gv = jnp.float32(g)

    def s(u):
        wi = jnp.broadcast_to(jnp.asarray(WI), (len(u), 3))
        wo, pdf = phase.hg_sample(gv, wi, jnp.asarray(u))
        return np.asarray(wo), np.ones(len(u))

    def pf(d):
        wi = jnp.broadcast_to(jnp.asarray(WI), (len(d), 3))
        return np.asarray(phase.hg_eval(gv, wi, jnp.asarray(d)))

    test = ChiSquareTest(
        SphericalDomain(), s, pf, sample_count=n, res=25, ires=16, seed=3
    )
    assert test.run(test_count=4), test.messages


def test_hg_chi2_forward():
    _chi2_phase(0.6)


def test_hg_chi2_backward():
    _chi2_phase(-0.4)


def test_hg_normalization():
    # integrate hg_eval over the sphere with a cos-theta quadrature
    mu = np.linspace(-1 + 1e-5, 1 - 1e-5, 20_001).astype(np.float32)
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - mu * mu))
    wi = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (len(mu), 1))
    # cos wrt propagation dir -wi=-z: wo_z = -mu
    wo = jnp.asarray(np.stack([sin_t, np.zeros_like(mu), -mu], -1))
    val = np.asarray(phase.hg_eval(jnp.float32(0.7), wi, wo))
    integral = 2 * np.pi * np.trapezoid(val.astype(np.float64), mu)
    assert abs(integral - 1.0) < 1e-3


def test_rayleigh_chi2():
    def s(u):
        wi = jnp.broadcast_to(jnp.asarray(WI), (len(u), 3))
        wo, pdf = phase.rayleigh_sample(wi, jnp.asarray(u))
        return np.asarray(wo), np.ones(len(u))

    def pf(d):
        wi = jnp.broadcast_to(jnp.asarray(WI), (len(d), 3))
        return np.asarray(phase.rayleigh_eval(wi, jnp.asarray(d)))

    test = ChiSquareTest(
        SphericalDomain(), s, pf, sample_count=100_000, res=25, ires=16,
        seed=5,
    )
    assert test.run(test_count=4), test.messages


# ------------------------------------------------------------------ media


def _hom_table(sigma=(0.5, 1.0, 2.0), albedo=(0.8, 0.8, 0.8)):
    return med.build_table(
        [
            dict(
                type="homogeneous",
                sigma_t=np.asarray(sigma, np.float32),
                albedo=np.asarray(albedo, np.float32),
                phase_type=phase.ISOTROPIC,
                phase_g=0.0,
                density=None,
                to_world=None,
            )
        ],
        [0],
        1,
    )


def _het_table(dens, sigma=(1.0, 1.0, 1.0), to_world=None):
    return med.build_table(
        [
            dict(
                type="heterogeneous",
                sigma_t=np.asarray(sigma, np.float32),
                albedo=np.asarray([0.9, 0.9, 0.9], np.float32),
                phase_type=phase.ISOTROPIC,
                phase_g=0.0,
                density=dens,
                to_world=to_world,
            )
        ],
        [0],
        1,
    )


def test_homogeneous_transmittance_analytic():
    table = _hom_table()
    n = 8
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    dist = jnp.linspace(0.1, 3.0, n)
    mid = jnp.zeros(n, jnp.int32)
    tr = med.transmittance(
        table, mid, o, d, dist, jnp.uint32(0), jnp.arange(n, dtype=jnp.uint32),
        jnp.uint32(0),
    )
    expect = np.exp(
        -np.asarray([0.5, 1.0, 2.0]) * np.asarray(dist)[:, None]
    )
    np.testing.assert_allclose(np.asarray(tr), expect, rtol=1e-5)


def test_vacuum_lanes_identity():
    table = _hom_table()
    n = 4
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    mid = jnp.full((n,), -1, jnp.int32)
    tr = med.transmittance(
        table, mid, o, d, jnp.ones(n), jnp.uint32(0),
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
    )
    np.testing.assert_allclose(np.asarray(tr), 1.0)
    ms = med.sample_interaction(
        table, mid, o, d, jnp.ones(n), jnp.uint32(0),
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
    )
    assert not np.any(np.asarray(ms.is_medium))
    np.testing.assert_allclose(np.asarray(ms.weight), 1.0)


def test_homogeneous_distance_sampling_unbiased():
    """E[weight * 1_pass] over the free-flight estimator = transmittance."""
    sigma = (0.4, 0.9, 1.7)
    table = _hom_table(sigma=sigma, albedo=(1.0, 1.0, 1.0))
    n = 200_000
    t_max = 1.3
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    mid = jnp.zeros(n, jnp.int32)
    ms = med.sample_interaction(
        table, mid, o, d, jnp.full((n,), t_max), jnp.uint32(7),
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
    )
    w = np.asarray(ms.weight)
    passed = ~np.asarray(ms.is_medium)
    est = (w * passed[:, None]).mean(0)
    expect = np.exp(-np.asarray(sigma) * t_max)
    np.testing.assert_allclose(est, expect, rtol=0.02)


def test_heterogeneous_constant_grid_matches_homogeneous():
    """Ratio tracking through a constant-density grid == analytic hom."""
    dens = np.full((4, 4, 4), 0.8, np.float32)
    # grid spans [0,1]^3 (identity to_world)
    table = _het_table(dens, sigma=(1.5, 1.5, 1.5))
    n = 100_000
    o = jnp.tile(jnp.asarray([0.5, 0.5, 0.0]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    dist = jnp.full((n,), 0.9)
    mid = jnp.zeros(n, jnp.int32)
    tr = med.transmittance(
        table, mid, o, d, dist, jnp.uint32(11),
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
    )
    est = np.asarray(tr).mean(0)
    expect = np.exp(-1.5 * 0.8 * 0.9)
    np.testing.assert_allclose(est, expect, rtol=0.02)


def test_heterogeneous_delta_tracking_unbiased():
    dens = np.full((2, 2, 2), 0.5, np.float32)
    table = _het_table(dens, sigma=(2.0, 2.0, 2.0))
    n = 150_000
    t_max = 0.8
    o = jnp.tile(jnp.asarray([0.5, 0.5, 0.1]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    mid = jnp.zeros(n, jnp.int32)
    ms = med.sample_interaction(
        table, mid, o, d, jnp.full((n,), t_max), jnp.uint32(13),
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
    )
    w = np.asarray(ms.weight)
    passed = ~np.asarray(ms.is_medium)
    est = (w * passed[:, None]).mean(0)
    expect = np.exp(-2.0 * 0.5 * t_max)
    np.testing.assert_allclose(est, expect, rtol=0.02)


# -------------------------------------------------------------- end-to-end


def _fog_scene(sigma, albedo, radius=0.8, emitter_radiance=2.0, depth=8):
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": depth},
            "sensor": {
                "type": "perspective",
                "fov": 30,
                "to_world": {
                    "look_at": {
                        "origin": [0, 0, -4],
                        "target": [0, 0, 0],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 24, "height": 24},
                "sampler": {"type": "independent", "sample_count": 192},
            },
            "light": {"type": "constant", "radiance": [emitter_radiance] * 3},
            "fog": {
                "type": "sphere",
                "center": [0, 0, 0],
                "radius": radius,
                "bsdf": {"type": "null"},
                "interior": {
                    "type": "homogeneous",
                    "sigma_t": sigma,
                    "albedo": albedo,
                },
            },
        }
    )


def test_volpath_absorbing_sphere_beer_lambert():
    """Pure absorption: center pixels attenuate by exp(-sigma * chord).

    The pass-through estimator is a Bernoulli(exp(-sigma*chord)) * L_bg
    per sample, so the tolerance is 3x its standard error over the
    averaged 2x2 center block (chord varies <1% across it)."""
    sigma = 1.2
    radius = 0.8
    spp = 512
    scene = _fog_scene([sigma] * 3, [0.0, 0.0, 0.0], radius=radius)
    img = np.asarray(mct.render(scene, spp=spp, seed=3))
    center = img[11:13, 11:13].mean()
    corner = img[1, 1].mean()
    chord = 2.0 * radius
    p = np.exp(-sigma * chord)
    expect_center = 2.0 * p
    n_samples = 4 * spp * 3
    stderr = 2.0 * np.sqrt(p * (1 - p) / n_samples)
    assert abs(corner - 2.0) < 0.05, corner
    assert abs(center - expect_center) < 3.0 * stderr + 0.01, (
        center, expect_center)


def test_volpath_scattering_conserves_energy():
    """albedo=1 fog in a uniform radiance field stays at that radiance
    (radiative equilibrium): scattering must neither create nor lose
    energy."""
    scene = _fog_scene([1.0] * 3, [1.0, 1.0, 1.0], depth=32)
    img = np.asarray(mct.render(scene, seed=5))
    center = img[12, 12].mean()
    np.testing.assert_allclose(center, 2.0, rtol=0.08)


def test_volpath_no_media_matches_path():
    """volpath on a media-free scene reduces to the surface path tracer."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": {
                "look_at": {
                    "origin": [0, 0.4, -3],
                    "target": [0, 0, 0],
                    "up": [0, 1, 0],
                }
            },
            "film": {"width": 16, "height": 16},
            "sampler": {"type": "independent", "sample_count": 256},
        },
        "light": {"type": "constant", "radiance": [0.6, 0.7, 0.8]},
        "ball": {
            "type": "sphere",
            "center": [0, 0, 0],
            "radius": 0.7,
            "bsdf": {"type": "diffuse", "reflectance": [0.4, 0.5, 0.6]},
        },
    }
    scene = mct.load_dict(d)
    img_path = np.asarray(mct.render(scene, seed=2))
    d["integrator"] = {"type": "volpath", "max_depth": 3}
    scene_v = mct.load_dict(d)
    img_vol = np.asarray(mct.render(scene_v, seed=2))
    np.testing.assert_allclose(img_vol, img_path, atol=5e-3)


# ---------------------------------------------------------------------------
# Differentiable media (round-2 verdict item 6 — prbvolpath capability)
# ---------------------------------------------------------------------------


def test_media_traverse_update_roundtrip():
    import jax

    from mitsuba_customization_tpu.render import params as params_mod

    scene = _fog_scene([1.0, 1.0, 1.0], [0.5, 0.5, 0.5])
    full = params_mod.traverse(scene)
    for key in ("medium.sigma_t", "medium.albedo", "medium.phase_g",
                "medium.density"):
        assert key in full, key
    new_sig = full["medium.sigma_t"] * 2.0
    sc2 = params_mod.update(scene, {"medium.sigma_t": new_sig})
    np.testing.assert_allclose(np.asarray(sc2.media.sigma_t),
                               np.asarray(new_sig))
    # majorant tracks the updated extinction (sampling stays valid)
    np.testing.assert_allclose(
        np.asarray(sc2.media.majorant),
        np.asarray(jnp.mean(new_sig, axis=-1)),
        rtol=1e-6,
    )


@pytest.mark.slow  # nightly (-m ""): heavy compile/render; a faster sibling test keeps default coverage
def test_sigma_t_grad_matches_analytic():
    """Absorption-only fog: d(center)/d(sigma scale) = -sigma*chord*T*L.

    The detached estimator's per-lane gradient is a Bernoulli-weighted
    constant, so the MC gradient converges to the Beer-Lambert derivative.
    """
    import jax

    from mitsuba_customization_tpu.render import params as params_mod
    from mitsuba_customization_tpu.render.integrator import render

    sigma, radius, rad = 1.0, 0.8, 2.0
    spp = 256
    scene = _fog_scene([sigma] * 3, [0.0] * 3, radius=radius,
                       emitter_radiance=rad, depth=4)
    full = params_mod.traverse(scene)

    def center(scale):
        sc = params_mod.update(
            scene, {"medium.sigma_t": full["medium.sigma_t"] * scale}
        )
        img = render(sc, spp=spp, seed=7, ad_mode=True)
        return img[11:13, 11:13].mean()

    g = float(jax.grad(center)(1.0))
    chord = 2.0 * radius
    expect = -sigma * chord * np.exp(-sigma * chord) * rad
    # MC stderr of the gradient estimator (Bernoulli * constant)
    p = np.exp(-sigma * chord)
    n = 4 * spp * 3
    stderr = rad * sigma * chord * np.sqrt(p * (1 - p) / n)
    assert abs(g - expect) < 4.0 * stderr + 0.02, (g, expect)


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_phase_and_albedo_grads_finite_nonzero():
    import jax

    from mitsuba_customization_tpu.render import params as params_mod
    from mitsuba_customization_tpu.render.integrator import render

    scene = _fog_scene([1.5] * 3, [0.7] * 3, depth=4)
    scene = mct.load_dict  # noqa: F841  (keep import style uniform)
    scene = _fog_scene([1.5] * 3, [0.7] * 3, depth=4)
    full = params_mod.traverse(scene)

    def loss(p):
        sc = params_mod.update(scene, p)
        img = render(sc, spp=32, seed=2, ad_mode=True)
        return jnp.mean((img - 0.5) ** 2)

    g = jax.grad(loss)(
        {
            "medium.albedo": full["medium.albedo"],
            "medium.phase_g": full["medium.phase_g"],
        }
    )
    ga = np.asarray(g["medium.albedo"])
    gg = np.asarray(g["medium.phase_g"])
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0.0
    assert np.isfinite(gg).all()


@pytest.mark.slow
def test_volume_recovery_sigma():
    """Mini inverse rendering: recover a fog density (config-3-class for
    media) — loss must drop substantially under Adam on medium.sigma_t."""
    import jax
    import optax

    from mitsuba_customization_tpu.render import params as params_mod
    from mitsuba_customization_tpu.render.integrator import render

    target_scene = _fog_scene([1.6] * 3, [0.0] * 3, depth=4)
    target = jnp.asarray(np.asarray(mct.render(target_scene, spp=96, seed=1)))

    scene = _fog_scene([0.6] * 3, [0.0] * 3, depth=4)
    full = params_mod.traverse(scene)
    params = {"medium.sigma_t": full["medium.sigma_t"]}

    @jax.jit
    def step_loss(p, seed):
        sc = params_mod.update(scene, p)
        img = render(sc, spp=48, seed=seed, ad_mode=True)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(0.15)
    state = opt.init(params)
    loss0 = None
    for it in range(8):
        loss, grads = jax.value_and_grad(step_loss)(params, jnp.uint32(it))
        if loss0 is None:
            loss0 = float(loss)
        upd, state = opt.update(grads, state)
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.maximum(a + b, 0.01), params, upd
        )
    final = float(step_loss(params, jnp.uint32(99)))
    assert final < 0.35 * loss0, (loss0, final)
    sig = float(np.asarray(params["medium.sigma_t"]).mean())
    assert 1.1 < sig < 2.2, sig


def test_emissive_medium_analytic():
    """Emissive homogeneous medium (0.6-stack capability): a pure
    absorber-emitter (albedo 0) ball seen through its center must match
    the analytic L = Le * (1 - exp(-sigma * 2r)) transport solution."""
    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render.integrator import render
    from mitsuba_customization_tpu.render.sensors import look_at

    sigma = 0.8
    le = np.asarray([2.0, 1.5, 1.0])
    r = 1.0
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": 16},
            "sensor": {
                "type": "perspective",
                "fov": 30,
                "to_world": look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 12, "height": 12},
                "sampler": {"type": "independent", "sample_count": 64},
            },
            "ball": {
                "type": "sphere", "center": [0, 0, 0], "radius": r,
                "bsdf": {"type": "null"},
                "interior": {
                    "type": "homogeneous",
                    "sigma_t": [sigma, sigma, sigma],
                    "albedo": [0.0, 0.0, 0.0],
                    "radiance": list(le),
                },
            },
        }
    )
    img = np.asarray(render(scene, spp=64, seed=5))
    assert np.isfinite(img).all()
    center = img[6, 6]
    expect = le * (1.0 - np.exp(-sigma * 2 * r))
    assert np.allclose(center, expect, rtol=0.15), (center, expect)
    # corners look past the ball -> black (no other emitters)
    assert img[0, 0].max() < 0.05


def test_sggx_phase_isotropic_limit_and_normalization():
    """SGGX specular microflakes (models/phase.py SGGX): S = I collapses
    to the isotropic phase exactly; anisotropic S stays a normalized
    density and sample()'s pdf matches eval()."""
    import jax
    import jax.numpy as jnp

    from mitsuba_customization_tpu.models import phase as ph

    rng = np.random.RandomState(3)

    def units(n):
        v = rng.normal(size=(n, 3))
        return jnp.asarray(
            (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(
                np.float32
            )
        )

    n = 1 << 15
    wi = units(n)
    wo = units(n)

    # S = I: f_p = 1/(4 pi) for every direction pair (exact)
    S_iso = jnp.tile(jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32), (n, 1))
    val = np.asarray(ph.sggx_eval(S_iso, wi, wo))
    np.testing.assert_allclose(val, 1.0 / (4 * np.pi), rtol=1e-4)

    # anisotropic fiber-like S: MC normalization over uniform sphere
    S = jnp.tile(
        jnp.asarray([1.0, 0.09, 0.25, 0.0, 0.0, 0.1], jnp.float32), (n, 1)
    )
    wi1 = jnp.tile(units(1), (n, 1))
    integ = np.asarray(ph.sggx_eval(S, wi1, wo)).mean() * 4 * np.pi
    assert abs(integ - 1.0) < 0.05, integ

    # sample()/eval() consistency via a bounded moment (E[1/pdf] has
    # unbounded variance for peaked lobes): for samples ~ p,
    # E[g] must equal the uniform-sphere MC of g * eval * 4pi.
    u2 = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    wo_s, pdf_s = jax.jit(ph.sggx_sample)(S, wi1, u2)
    pdf_direct = np.asarray(ph.sggx_eval(S, wi1, wo_s))
    np.testing.assert_allclose(
        np.asarray(pdf_s), pdf_direct, rtol=1e-3, atol=1e-6
    )
    axis = np.asarray([0.3, 0.5, 0.81], np.float32)
    axis /= np.linalg.norm(axis)

    def g(w):
        c = np.asarray(w) @ axis
        return (1.0 + c) ** 2

    mean_sampled = g(wo_s).mean()
    mean_ref = (
        g(wo) * np.asarray(ph.sggx_eval(S, wi1, wo))
    ).mean() * 4 * np.pi
    assert abs(mean_sampled - mean_ref) / mean_ref < 0.06, (
        mean_sampled, mean_ref
    )


def test_sggx_volpath_render_finite():
    """A fog ball with an SGGX phase renders through volpath."""
    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render.integrator import render
    from mitsuba_customization_tpu.render.sensors import look_at

    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": 4},
            "sensor": {
                "type": "perspective", "fov": 40,
                "to_world": look_at([0, 0, -3.5], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 12, "height": 12},
                "sampler": {"type": "independent", "sample_count": 8},
            },
            "ball": {
                "type": "sphere", "center": [0, 0, 0], "radius": 0.9,
                "bsdf": {"type": "null"},
                "interior": {
                    "type": "homogeneous",
                    "sigma_t": [1.2, 1.2, 1.2],
                    "albedo": [0.9, 0.9, 0.9],
                    "phase": {"type": "sggx",
                              "S": [1.0, 0.09, 0.25, 0.0, 0.0, 0.1]},
                },
            },
            "light": {
                "type": "rectangle",
                "to_world": {"rotate": {"axis": [1, 0, 0], "angle": 90},
                             "scale": 1.0, "translate": [0, 2.8, 0]},
                "emitter": {"type": "area", "radiance": [10, 10, 10]},
            },
        }
    )
    img = np.asarray(render(scene, spp=8, seed=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
