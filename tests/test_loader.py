"""XML / dict scene loader tests (src/libcore/tests/test_xml.py analog)."""
import numpy as np
import pytest

from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import loader

CBOX_XML = """
<scene version="2.0.0">
  <default name="spp" value="8"/>
  <integrator type="path">
    <integer name="max_depth" value="$depth"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="39.5"/>
    <transform name="to_world">
      <lookat origin="0.5 0.5 -1.39" target="0.5 0.5 0.5" up="0 1 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="24"/>
      <integer name="height" value="24"/>
    </film>
    <sampler type="independent">
      <integer name="sample_count" value="$spp"/>
    </sampler>
  </sensor>
  <bsdf type="diffuse" id="white">
    <rgb name="reflectance" value="0.73 0.735 0.729"/>
  </bsdf>
  <shape type="rectangle" id="floor">
    <transform name="to_world">
      <rotate x="1" angle="-90"/>
      <scale value="0.5"/>
      <translate x="0.5" y="0" z="0.5"/>
    </transform>
    <ref id="white"/>
  </shape>
  <shape type="rectangle" id="light">
    <transform name="to_world">
      <rotate x="1" angle="90"/>
      <scale value="0.13"/>
      <translate x="0.5" y="0.9995" z="0.5"/>
    </transform>
    <ref id="white"/>
    <emitter type="area">
      <rgb name="radiance" value="18.4 15.6 8.0"/>
    </emitter>
  </shape>
</scene>
"""


def test_load_string_renders():
    scene, config = loader.load_string(CBOX_XML, depth=3)
    assert config.max_depth == 3
    assert config.spp == 8
    assert (config.width, config.height) == (24, 24)
    assert scene.n_shapes == 2
    img = np.asarray(render(scene, config))
    assert img.shape == (24, 24, 3)
    assert img.max() > 0.0  # light visible / floor lit
    assert np.isfinite(img).all()


def test_default_override():
    _, config = loader.load_string(CBOX_XML, depth=2, spp=4)
    assert config.spp == 4


def test_undefined_param_raises():
    with pytest.raises(ValueError, match="undefined parameter"):
        loader.load_string(CBOX_XML)  # $depth not provided


def test_undefined_ref_raises():
    xml = """<scene version="2.0.0">
      <shape type="sphere"><ref id="nope"/></shape></scene>"""
    with pytest.raises(ValueError, match="undefined reference"):
        loader.load_string(xml)


def test_transform_composition():
    """scale-then-translate must place the unit rect at [0,1]^2 in xz."""
    scene, config = loader.load_string(CBOX_XML, depth=2)
    floor_prims = np.asarray(scene.prim_shape) == 0
    p0 = np.asarray(scene.prim_p0)[floor_prims]
    e1 = np.asarray(scene.prim_e1)[floor_prims]
    e2 = np.asarray(scene.prim_e2)[floor_prims]
    pts = np.concatenate([p0, p0 + e1, p0 + e2])
    assert pts[:, 0].min() >= -1e-4 and pts[:, 0].max() <= 1 + 1e-4
    np.testing.assert_allclose(pts[:, 1], 0, atol=1e-6)


def test_load_dict():
    scene, config = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": np.eye(4),
                   "film": {"width": 16, "height": 16},
                   "sampler": {"sample_count": 4}},
        "white": {"type": "diffuse", "reflectance": [0.8, 0.8, 0.8]},
        "ball": {"type": "sphere", "center": [0, 0, 3], "radius": 1.0,
                 "bsdf": "white"},
        "env": {"type": "constant", "radiance": [0.5, 0.5, 0.5]},
    })
    assert config.max_depth == 2 and config.spp == 4
    img = np.asarray(render(scene, config))
    assert img.shape == (16, 16, 3)
    assert img.max() > 0.1


def test_load_file_with_include(tmp_path):
    inc = tmp_path / "mat.xml"
    inc.write_text("""<scene version="2.0.0">
      <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.8 0.8 0.8"/></bsdf></scene>""")
    main = tmp_path / "main.xml"
    main.write_text("""<scene version="2.0.0">
      <include filename="mat.xml"/>
      <shape type="sphere"><ref id="white"/></shape></scene>""")
    scene, _ = loader.load_file(str(main))
    assert scene.n_shapes == 1


def test_shapegroup_instance_xml(monkeypatch):
    # this test exercises the shared-BLAS XML plumbing; the auto policy
    # would flatten a scene this small (scene._should_flatten_instances)
    monkeypatch.setenv("MI_FLATTEN_INSTANCES", "0")
    """shapegroup + instance share one BLAS (src/shapes/
    {shapegroup,instance}.cpp; OptiX-IAS analog): the group's geometry
    appears ONCE in the scene tables regardless of instance count."""
    import numpy as np
    from mitsuba2_tpu.scene.loader import load_string
    xml = """
    <scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="to_world">
          <lookat origin="0 0 6" target="0 0 0" up="0 1 0"/>
        </transform>
        <film><integer name="width" value="16"/><integer name="height" value="16"/></film>
        <sampler type="stratified"><integer name="sample_count" value="8"/></sampler>
      </sensor>
      <emitter type="constant"><rgb name="radiance" value="1 1 1"/></emitter>
      <shape type="shapegroup" id="grp">
        <shape type="sphere"><float name="radius" value="0.5"/></shape>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="to_world"><translate x="-1.2"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="to_world"><translate x="1.2"/></transform>
      </shape>
    </scene>
    """
    scene, cfg = load_string(xml)
    assert cfg.sampler == "stratified"
    # shared-BLAS: the sphere is stored once; two instances reference it
    assert scene.has_instances
    assert scene.n_shapes == 1 and scene.n_prims == 1
    assert scene.inst_inv.shape[0] == 2  # no plain shapes -> no world inst
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render
    img = np.asarray(render(scene, cfg.replace(spp=8, spp_per_pass=8,
                                               max_depth=2)))
    left, right = img[:, :8].mean(), img[:, 8:].mean()
    assert abs(left - right) < 0.05


def test_version_upgrade_camelcase():
    """Scenes declaring version < 2.0 get xml.cpp::upgrade_tree treatment:
    camelCase property names and <lookAt> rewritten to 2.x forms."""
    xml = """
    <scene version="0.5.0">
      <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
          <lookAt origin="0, 0, 2.5" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
      </sensor>
      <shape type="rectangle">
        <bsdf type="diffuse">
          <rgb name="reflectance" value="0.5, 0.5, 0.5"/>
        </bsdf>
        <emitter type="area">
          <rgb name="radiance" value="2, 2, 2"/>
        </emitter>
      </shape>
    </scene>"""
    scene, config = loader.load_string(xml)
    assert scene.n_prims >= 2
    img = np.asarray(render(scene, config.replace(width=8, height=8, spp=2,
                                                  spp_per_pass=2)))
    assert np.isfinite(img).all() and img.max() > 0


def test_inline_shape_bsdf():
    """A <bsdf> child nested directly inside <shape> (the common scene
    idiom, vs a <ref>) must bind to that shape — regression: it was
    silently dropped, leaving the default diffuse."""
    from mitsuba2_tpu.render import bsdf as bsdf_mod
    xml = """<scene version="2.0.0">
      <sensor type="perspective"/>
      <shape type="sphere">
        <bsdf type="conductor"/>
      </shape>
      <shape type="rectangle">
        <bsdf type="twosided">
          <bsdf type="diffuse"><rgb name="reflectance" value="0.9 0.1 0.1"/></bsdf>
        </bsdf>
      </shape>
    </scene>"""
    scene, _ = loader.load_string(xml)
    mat0 = int(np.asarray(scene.mat_type)[np.asarray(scene.shape_mat)[0]])
    mat1 = int(np.asarray(scene.mat_type)[np.asarray(scene.shape_mat)[1]])
    assert mat0 == bsdf_mod.Conductor.id
    assert mat1 == bsdf_mod.Diffuse.id  # twosided unwraps to the child


def test_spectrum_pairs_and_spd_files(tmp_path):
    """<spectrum value="wl:v, ..."/> and <spectrum filename="x.spd"/> load
    as tabulated (irregular) spectra, not flat means — a green-peaked
    emitter must come out green through the exact CIE projection."""
    spd = tmp_path / "green.spd"
    spd.write_text("# green-peaked SPD\n400 0.0\n500 0.2\n540 1.0\n"
                   "580 0.2\n700 0.0\n")
    xml = f"""<scene version="2.0.0">
      <sensor type="perspective"/>
      <shape type="rectangle">
        <emitter type="area">
          <spectrum name="radiance" filename="{spd.name}"/>
        </emitter>
      </shape>
      <shape type="sphere">
        <bsdf type="diffuse">
          <spectrum name="reflectance" value="400:0.9, 500:0.5, 700:0.1"/>
        </bsdf>
      </shape>
    </scene>"""
    p = tmp_path / "scene.xml"
    p.write_text(xml)
    scene, _ = loader.load_file(str(p))
    # emitter slot: CIE-projected RGB of the 540nm-peaked SPD -> green
    # dominates both other channels
    r, g, b = np.asarray(scene.emitter_data)[0][:3]
    assert g > 5 * r and g > 5 * b
    # reflectance slot: short-wavelength-heavy downslope (0.9 @ 400nm,
    # 0.1 @ 700nm) -> blue > green > red
    mat = np.asarray(scene.mat_data)[np.asarray(scene.shape_mat)[1]]
    assert mat[2] > mat[1] > mat[0]


def test_alias_and_multi_sensor():
    """<alias> re-registers a named bsdf; multiple <sensor> tags keep
    reference semantics (sensors[0] default, sensor_index selects)."""
    xml = """<scene version="2.0.0">
      <bsdf type="conductor" id="metal"/>
      <alias id="metal" as="shiny"/>
      <shape type="sphere"><ref id="shiny"/></shape>
      <sensor type="perspective">
        <film type="hdrfilm"><integer name="width" value="16"/>
        <integer name="height" value="16"/></film>
      </sensor>
      <sensor type="perspective">
        <film type="hdrfilm"><integer name="width" value="48"/>
        <integer name="height" value="48"/></film>
      </sensor>
    </scene>"""
    from mitsuba2_tpu.render import bsdf as bsdf_mod
    scene, cfg = loader.load_string(xml)
    assert (cfg.width, cfg.height) == (16, 16)   # first sensor wins
    mat0 = int(np.asarray(scene.mat_type)[np.asarray(scene.shape_mat)[0]])
    assert mat0 == bsdf_mod.Conductor.id          # alias resolved
    _, cfg2 = loader.load_string(xml, sensor_index=1)
    assert (cfg2.width, cfg2.height) == (48, 48)
    with pytest.raises(ValueError, match="sensor_index"):
        loader.load_string(xml, sensor_index=5)


def test_flip_normals_and_fov_axis():
    """shape.cpp's flip_normals (meshes: winding+normals; spheres: the
    analytic normal via the e1.y sign channel) and perspective.cpp's
    fov_axis conversion to the internal x-fov."""
    from mitsuba2_tpu.core.geometry import Ray
    from mitsuba2_tpu.core.vec import Vec3
    from mitsuba2_tpu.scene.scene import ray_intersect
    import jax.numpy as jnp

    xml = """<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <string name="fov_axis" value="{axis}"/>
        <film type="hdrfilm"><integer name="width" value="200"/>
        <integer name="height" value="100"/></film>
      </sensor>
      <shape type="sphere">{flip}</shape>
    </scene>"""
    s_x, _ = loader.load_string(xml.format(axis="x", flip=""))
    s_y, _ = loader.load_string(xml.format(axis="y", flip=""))
    s_d, _ = loader.load_string(xml.format(axis="diagonal", flip=""))
    assert np.isclose(float(s_x.cam_fov_x), 60.0)
    # y-axis fov on a 2:1 film -> wider x fov
    ty = np.tan(np.deg2rad(30.0)) * 2.0
    assert np.isclose(float(s_y.cam_fov_x), np.rad2deg(2 * np.arctan(ty)),
                      atol=1e-4)
    td = np.tan(np.deg2rad(30.0)) * 200 / np.hypot(200, 100)
    assert np.isclose(float(s_d.cam_fov_x), np.rad2deg(2 * np.arctan(td)),
                      atol=1e-4)

    # sphere normals flip inward
    flip = '<boolean name="flip_normals" value="true"/>'
    s_n, _ = loader.load_string(xml.format(axis="x", flip=""))
    s_f, _ = loader.load_string(xml.format(axis="x", flip=flip))
    ray = Ray.make(o=Vec3(jnp.array([0.0]), jnp.array([0.0]),
                          jnp.array([3.0])),
                   d=Vec3(jnp.array([0.0]), jnp.array([0.0]),
                          jnp.array([-1.0])))
    nz_out = float(ray_intersect(s_n, ray).n.z[0])
    nz_in = float(ray_intersect(s_f, ray).n.z[0])
    assert nz_out > 0.99 and nz_in < -0.99

    # mesh winding + vertex normals flip
    xmlr = """<scene version="2.0.0"><sensor type="perspective"/>
      <shape type="rectangle">{flip}</shape></scene>"""
    r_n, _ = loader.load_string(xmlr.format(flip=""))
    r_f, _ = loader.load_string(xmlr.format(flip=flip))
    nz_r = float(ray_intersect(r_n, ray).n.z[0])
    nz_rf = float(ray_intersect(r_f, ray).n.z[0])
    assert nz_r > 0.99 and nz_rf < -0.99


def test_load_dict_full_types():
    """The dict loader accepts the same type vocabulary as XML: all bsdf
    families, all sensors (with fov_axis/clip), wrapper integrators,
    projector emitters, flip_normals."""
    import mitsuba2_tpu as mi
    scene, cfg = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "volpathmis", "max_depth": 4},
        "sensor": {"type": "thinlens", "fov": 60.0, "fov_axis": "y",
                   "aperture_radius": 0.05, "focus_distance": 3.0,
                   "near_clip": 0.01,
                   "to_world": np.eye(4),
                   "film": {"width": 64, "height": 32},
                   "sampler": {"type": "halton", "sample_count": 8}},
        "gold": {"type": "roughconductor", "material": "Au", "alpha": 0.2},
        "ball": {"type": "sphere", "bsdf": "gold", "flip_normals": True},
        "flash": {"type": "projector", "irradiance": [2, 2, 2],
                  "position": [0, 0, 4], "direction": [0, 0, -1]},
    })
    assert cfg.integrator == "volpathmis" and cfg.max_depth == 4
    assert (cfg.width, cfg.height) == (64, 32)
    assert cfg.sampler in ("halton", "ldsampler")
    # fov_axis=y on a 2:1 film widens the x fov
    ty = np.tan(np.deg2rad(30.0)) * 2.0
    assert np.isclose(float(scene.cam_fov_x),
                      np.rad2deg(2 * np.arctan(ty)), atol=1e-4)
    assert np.isclose(float(scene.cam_data[0]), 0.05)   # aperture
    assert np.isclose(float(scene.cam_data[8]), 0.01)   # near clip
    # flipped sphere: e1.y sign channel
    assert float(np.asarray(scene.prim_e1)[0, 1]) < 0
