"""Dry-run the bpy render scripts under a stub `bpy` (no Blender binary
in this container — same pattern as the stubbed-gradio app test).  This
executes every script body end-to-end: scene init, mesh normalize,
option handling (shading/subdivision/color/lights), camera math, and the
per-view render loop, asserting the rendered filepaths."""

import importlib
import os
import sys

import pytest

RENDER_DIR = os.path.join(os.path.dirname(__file__), "..", "rendering")


class Sub:
    """Auto-vivifying attribute/item bag standing in for bpy objects."""

    def __init__(self):
        object.__setattr__(self, "_items", {})

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        v = Sub()
        setattr(self, k, v)
        return v

    def __call__(self, *a, **kw):
        return Sub()

    def __getitem__(self, k):
        return self._items.setdefault(k, Sub())

    def __setitem__(self, k, v):
        self._items[k] = v

    def __iter__(self):
        # empty: without this, `for x in sub` falls back to the legacy
        # __getitem__(0,1,2,...) protocol and never terminates
        return iter(())


class FakeVector:
    def __init__(self, v):
        self.v = tuple(float(x) for x in v)

    def _coerce(self, other):
        return other.v if isinstance(other, FakeVector) else tuple(other)

    def __sub__(self, other):
        o = self._coerce(other)
        return FakeVector([a - b for a, b in zip(self.v, o)])

    def __rsub__(self, other):
        o = self._coerce(other)
        return FakeVector([b - a for a, b in zip(self.v, o)])

    def to_track_quat(self, *a):
        return self

    def to_euler(self):
        return (0.0, 0.0, 0.0)

    def __iter__(self):
        return iter(self.v)


@pytest.fixture()
def fake_bpy(monkeypatch):
    bpy = Sub()
    renders = []
    bpy.ops.render.render = (
        lambda write_still=True:
        renders.append(bpy.context.scene.render.filepath))
    obj = Sub()
    obj.dimensions = (2.0, 1.0, 1.5)
    obj.bound_box = [[x, y, z] for x in (-1, 1) for y in (-0.5, 0.5)
                     for z in (-0.75, 0.75)]
    bpy.context.selected_objects = [obj]

    mathutils = Sub()
    mathutils.Vector = FakeVector
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    monkeypatch.setitem(sys.modules, "mathutils", mathutils)
    monkeypatch.syspath_prepend(RENDER_DIR)
    # force re-import under the stub
    for name in ("blender_render", "blender_render_multiview",
                 "blender_render_pbr"):
        sys.modules.pop(name, None)
    return bpy, renders, obj


def test_multiview_script_renders_8_views(fake_bpy, monkeypatch, tmp_path):
    bpy, renders, obj = fake_bpy
    out = str(tmp_path / "renders")
    monkeypatch.setattr(sys, "argv", [
        "blender", "--", "-s", "mesh.obj", "-o", out])
    mod = importlib.import_module("blender_render_multiview")
    mod.main()
    assert len(renders) == 8
    assert renders[0] == os.path.join(out, "000.png")
    assert renders[-1] == os.path.join(out, "007.png")
    assert bpy.context.scene.cycles.samples == 128
    assert obj.scale[0] == pytest.approx(1.0 / (1.0 * 1.03))


def test_single_figure_script_options_and_geo_pass(fake_bpy, tmp_path):
    _, renders, obj = fake_bpy
    mod = importlib.import_module("blender_render")
    out = str(tmp_path / "fig.png")
    mod.main(["-s", "mesh.obj", "-o", out, "--shading", "flat",
              "--subdivision_iteration", "2", "--mesh_color", "red",
              "--scale", "0.5", "--rot", "30",
              "--light_intensity", "3", "--light_angle", "30",
              "--light_height", "1.5"])
    # textured pass + flat-color geometry pass
    assert renders == [out, out.replace(".png", "_geo.png")]
    # scale option applied on top of the unit normalize
    assert obj.scale[0] == pytest.approx(0.5 / 1.03)
    # the reference's paper palette is available verbatim
    assert mod.COLOR_DICT["red"] == [255, 154, 156, 255]


def test_single_figure_default_output_path(fake_bpy):
    mod = importlib.import_module("blender_render")
    args = mod.parse_args(["-s", "/x/mesh.obj"])
    assert args.output_path == "/x/mesh.png"
    args = mod.parse_args(["-s", "m.obj", "-o", "out"])
    assert args.output_path == "out.png"


def test_pbr_script_renders_8_views(fake_bpy, monkeypatch, tmp_path):
    bpy, renders, obj = fake_bpy
    out = str(tmp_path / "renders")
    monkeypatch.setattr(sys, "argv", [
        "blender", "--", "-s", "object.obj", "-o", out])
    mod = importlib.import_module("blender_render_pbr")
    mod.main()
    assert len(renders) == 8
    assert renders[3] == os.path.join(out, "003.png")
