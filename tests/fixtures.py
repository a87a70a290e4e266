"""Shared test fixtures: synthetic MERL-format tables.

No real MERL data ships in the repo (no network; SURVEY.md §6 note), so
tests synthesize physically plausible tables — a glossy lobe + lambertian
floor — written through the real file formats so loaders are exercised.
"""

import numpy as np

from mitsuba_customization_tpu.models.merl import MERL_DIMS, MERL_SCALE


def synthetic_table(alpha=0.15, diffuse=0.1, spec=1.0, rgb=(1.0, 0.7, 0.4)):
    """A plausible scaled-units (90,90,180,3) table: Beckmann-ish half-angle
    lobe + flat diffuse term, slightly phi_d-dependent."""
    n_th, n_td, n_pd = MERL_DIMS
    u = (np.arange(n_th) + 0.5) / n_th
    theta_h = (np.pi / 2) * u**2
    td = (np.arange(n_td) + 0.5) / n_td * (np.pi / 2)
    pd = (np.arange(n_pd) + 0.5) / n_pd * np.pi
    th_g, td_g, pd_g = np.meshgrid(theta_h, td, pd, indexing="ij")
    lobe = np.exp(-((np.tan(np.minimum(th_g, 1.5)) / alpha) ** 2))
    fres = 1.0 + 2.0 * (1.0 - np.cos(td_g)) ** 5
    mono = diffuse / np.pi + spec * lobe * fres * (1.0 + 0.05 * np.cos(2 * pd_g))
    table = mono[..., None] * np.asarray(rgb)
    return table.astype(np.float32)


def synthetic_table_file_units(**kw):
    """Same table in MERL file units (divide channel scales out)."""
    return (synthetic_table(**kw) / MERL_SCALE).astype(np.float64)
