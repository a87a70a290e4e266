"""XML scene loader tests (render/xml.py — xml::load_file analogue)."""

import numpy as np
import pytest

from mitsuba_customization_tpu.render import xml as xml_mod

XML = """<scene version="3.0.0">
  <default name="spp" value="8"/>
  <integrator type="path"><integer name="max_depth" value="5"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="50"/>
    <transform name="to_world">
      <lookat origin="0, 1, -3" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="20"/><integer name="height" value="10"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="$spp"/></sampler>
  </sensor>
  <bsdf type="diffuse" id="mat_white"><rgb name="reflectance" value="0.7 0.6 0.5"/></bsdf>
  <shape type="sphere">
    <point name="center" x="0" y="0" z="0"/>
    <float name="radius" value="0.5"/>
    <ref id="mat_white"/>
  </shape>
  <shape type="rectangle">
    <transform name="to_world"><rotate x="1" angle="-90"/><scale value="2"/><translate y="-0.5"/></transform>
    <bsdf type="roughconductor"><float name="alpha" value="0.3"/></bsdf>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="0.5"/></emitter>
</scene>"""


@pytest.fixture
def scene_file(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text(XML)
    return p


def test_parse_structure(scene_file):
    d = xml_mod.parse_file(scene_file)
    assert d["type"] == "scene"
    assert d["integrator"]["max_depth"] == 5
    sensors = [v for v in d.values()
               if isinstance(v, dict) and v.get("type") == "perspective"]
    assert len(sensors) == 1
    s = sensors[0]
    assert s["film"]["width"] == 20 and s["film"]["height"] == 10
    assert s["sampler"]["sample_count"] == 8  # $spp substituted
    assert d["mat_white"]["reflectance"] == [0.7, 0.6, 0.5]
    # single-value rgb broadcasts
    consts = [v for v in d.values()
              if isinstance(v, dict) and v.get("type") == "constant"]
    assert consts[0]["radiance"] == [0.5, 0.5, 0.5]


def test_define_override(scene_file):
    d = xml_mod.parse_file(scene_file, spp=32)
    sensors = [v for v in d.values()
               if isinstance(v, dict) and v.get("type") == "perspective"]
    assert sensors[0]["sampler"]["sample_count"] == 32


def test_undefined_var(tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text(
        '<scene version="3"><integrator type="path">'
        '<integer name="max_depth" value="$nope"/></integrator></scene>'
    )
    with pytest.raises(ValueError, match="undefined scene variable"):
        xml_mod.parse_file(p)


def test_load_and_render(scene_file):
    from mitsuba_customization_tpu.render.integrator import render_jit

    scene = xml_mod.load_file(scene_file)
    assert scene.config.max_depth == 5
    assert scene.config.width == 20 and scene.config.height == 10
    img = np.asarray(render_jit(scene, spp=4))
    assert img.shape == (10, 20, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_transform_composition(tmp_path):
    p = tmp_path / "t.xml"
    p.write_text(
        '<scene version="3"><shape type="sphere">'
        '<transform name="to_world"><scale value="2"/>'
        '<translate x="1" y="2" z="3"/></transform>'
        "</shape></scene>"
    )
    d = xml_mod.parse_file(p)
    shape = next(v for v in d.values()
                 if isinstance(v, dict) and v.get("type") == "sphere")
    m = np.asarray(shape["to_world"])
    assert np.allclose(m[:3, 3], [1, 2, 3])
    assert np.allclose(np.diag(m)[:3], 2)
