"""Single paper-figure Blender render — full option parity with the
reference `rendering/blender_render.py:18-32` (scale, rot, light
intensity/angle/height, shading smooth/flat, subdivision, mesh_color,
plus the second `_geo.png` flat-color pass), self-contained bpy (no
BlenderToolbox).

    blender -b -P blender_render.py -- -s mesh.obj [-o out.png]
        [-az 45] [-el 0] [--scale 1] [--rot 0]
        [--light_intensity 2] [--light_angle 45] [--light_height 2]
        [--image_resolution 512 512] [--number_of_samples 200]
        [--shading smooth|flat] [--subdivision_iteration 0]
        [--mesh_color grey|red|green|blue]
"""

import argparse
import math
import os
import sys

import bpy
from mathutils import Vector

# reference's paper palette (`blender_render.py:152-161`)
COLOR_DICT = {
    "blue": [144, 210, 236, 255],
    "green": [165, 221, 144, 255],
    "red": [255, 154, 156, 255],
    "grey": [134, 134, 134, 255],
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--mesh_path", type=str, required=True)
    parser.add_argument("-o", "--output_path", type=str, default=None)
    parser.add_argument("-az", "--azimuth", type=float, default=45.0)
    parser.add_argument("-el", "--elevation", type=float, default=0.0)
    parser.add_argument("--scale", type=float, default=1.0,
                        help="mesh scale")
    parser.add_argument("--rot", type=float, default=0.0,
                        help="horizontal rotation (deg)")
    parser.add_argument("--light_intensity", type=float, default=2.0)
    parser.add_argument("--light_angle", type=float, default=45.0)
    parser.add_argument("--light_height", type=float, default=2.0)
    parser.add_argument("--image_resolution", nargs=2, type=int,
                        default=(512, 512))
    parser.add_argument("--number_of_samples", type=int, default=200)
    parser.add_argument("--shading", type=str, default="smooth",
                        choices=["smooth", "flat"])
    parser.add_argument("--subdivision_iteration", type=int, default=0)
    parser.add_argument("--mesh_color", type=str, default="grey",
                        choices=sorted(COLOR_DICT))
    parser.add_argument("-g", "--gpu_id", type=int, default=None)
    if argv is None:
        argv = sys.argv[sys.argv.index("--") + 1:]
    args = parser.parse_args(argv)
    if args.output_path is None:
        args.output_path = os.path.splitext(args.mesh_path)[0] + ".png"
    if not args.output_path.endswith(".png"):
        args.output_path += ".png"
    return args


def setup_mesh(args):
    """Load, rotate [90, 0, rot], center on bounds, scale to the unit box
    (enlarge 1.03) x args.scale; apply shading + optional subdivision.
    Returns (mesh object, min z of the scaled bbox)."""
    from blender_render_multiview import load_and_normalize
    obj = load_and_normalize(args.mesh_path)
    obj.rotation_euler = (math.radians(90), 0.0, math.radians(args.rot))
    s = obj.scale[0] * args.scale
    obj.scale = (s, s, s)
    bpy.context.view_layer.update()
    import numpy as np
    # reference takes bound_box min along axis 1 (`blender_render.py:68`)
    mesh_minz = float(np.array([list(v) for v in obj.bound_box])
                      .min(axis=0)[1]) * s

    if args.shading == "smooth":
        bpy.ops.object.shade_smooth()
    else:
        bpy.ops.object.shade_flat()
    if args.subdivision_iteration > 0:
        mod = obj.modifiers.new("Subdivision", "SUBSURF")
        mod.levels = args.subdivision_iteration
        mod.render_levels = args.subdivision_iteration
    return obj, mesh_minz


def add_shadow_catcher(z: float):
    """Invisible ground plane catching the contact shadow
    (bt.invisibleGround equivalent)."""
    bpy.ops.mesh.primitive_plane_add(size=20, location=(0, 0, z))
    plane = bpy.context.object
    plane.is_shadow_catcher = True
    return plane


def add_sun_and_ambient(args):
    """Sun light + dim ambient world (`blender_render.py:100-126`)."""
    rot = (0.0, math.radians(args.light_angle), 0.0)
    bpy.ops.object.light_add(type="SUN", rotation=rot,
                             location=(2, 0, args.light_height))
    sun = bpy.context.object
    sun.data.use_nodes = True
    sun.data.angle = 0.3  # shadow softness
    sun.data.node_tree.nodes["Emission"].inputs[
        "Strength"].default_value = args.light_intensity
    world = bpy.data.worlds.new("World")
    bpy.context.scene.world = world
    world.use_nodes = True
    bg = world.node_tree.nodes["Background"]
    bg.inputs[0].default_value = (0.1, 0.1, 0.1, 1.0)
    return sun


def set_camera(args):
    from blender_render_multiview import look_at
    cam_data = bpy.data.cameras.new("Camera")
    cam_data.lens = 45
    cam = bpy.data.objects.new("Camera", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    d = 3.0
    phi = math.radians(args.azimuth)
    theta = math.radians(args.elevation)
    cam.location = (d * math.sin(theta) * math.cos(phi),
                    d * math.sin(theta) * math.sin(phi),
                    d * math.cos(theta))
    look_at(cam, (0, 0, 0))
    return cam


def set_flat_color_material(obj, color_name: str):
    """Replace all materials with the paper flat color
    (bt.setMat_balloon analog: soft principled BSDF)."""
    rgba = [c / 255.0 for c in COLOR_DICT[color_name]]
    obj.data.materials.clear()
    mat = bpy.data.materials.new(f"paper_{color_name}")
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    bsdf.inputs["Base Color"].default_value = tuple(rgba)
    bsdf.inputs["Roughness"].default_value = 0.9
    obj.data.materials.append(mat)


def render_to(path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    bpy.context.scene.render.filepath = path
    bpy.ops.render.render(write_still=True)


def main(argv=None):
    from blender_render_multiview import init_scene
    args = parse_args(argv)
    init_scene(*args.image_resolution, args.number_of_samples)
    bpy.context.scene.view_settings.exposure = 1.5  # bt.blenderInit
    obj, mesh_minz = setup_mesh(args)
    add_shadow_catcher(mesh_minz - 0.01)
    add_sun_and_ambient(args)
    set_camera(args)

    # pass 1: textured render
    render_to(args.output_path)
    # pass 2: geometry-only flat color (`blender_render.py:151-168`)
    set_flat_color_material(obj, args.mesh_color)
    render_to(args.output_path.replace(".png", "_geo.png"))


if __name__ == "__main__":
    main()
