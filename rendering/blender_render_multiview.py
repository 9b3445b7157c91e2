"""Blender multi-view render script (runs INSIDE Blender):

    blender -b -P blender_render_multiview.py -- -s mesh.obj -o out_dir

Camera protocol matches the reference evaluation setup
(`/root/reference/rendering/blender_render_multiview.py:92-108`): 8 views
at azimuth 0..315 deg step 45, elevation 45 deg, distance 3, focal 45mm,
512x512, 128 Cycles samples, big area light + dim ambient.  Self-contained
bpy code — no BlenderToolbox dependency.
"""

import argparse
import math
import os
import sys

import bpy
from mathutils import Vector


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--mesh_path", type=str, required=True)
    parser.add_argument("-o", "--output_dir", type=str, required=True)
    parser.add_argument("--image_resolution", nargs=2, type=int,
                        default=(512, 512))
    parser.add_argument("--number_of_samples", type=int, default=128)
    parser.add_argument("-g", "--gpu_id", type=int, default=None)
    argv = sys.argv[sys.argv.index("--") + 1:]
    return parser.parse_args(argv)


def init_scene(res_x, res_y, samples):
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.cycles.samples = samples
    scene.render.resolution_x = res_x
    scene.render.resolution_y = res_y
    scene.render.film_transparent = True
    scene.view_settings.view_transform = "Filmic"
    scene.cycles.use_denoising = True
    try:
        prefs = bpy.context.preferences.addons["cycles"].preferences
        prefs.compute_device_type = "CUDA"
        for dev in prefs.get_devices_for_type("CUDA"):
            dev.use = True
        scene.cycles.device = "GPU"
    except Exception:
        scene.cycles.device = "CPU"


def load_and_normalize(mesh_path):
    bpy.ops.wm.obj_import(filepath=mesh_path, forward_axis="NEGATIVE_Z",
                          up_axis="Y")
    obj = bpy.context.selected_objects[0]
    bpy.context.view_layer.objects.active = obj
    bpy.ops.object.origin_set(type="ORIGIN_GEOMETRY", center="BOUNDS")
    obj.location = Vector((0, 0, 0))
    half = max(obj.dimensions) / 2 * 1.03
    s = 1.0 / half
    obj.scale = (s, s, s)
    bpy.context.view_layer.update()
    return obj


def add_lights():
    bpy.ops.object.light_add(type="AREA", location=(0, 0, 1.5))
    light = bpy.context.object
    light.data.energy = 30000
    light.scale = (100, 100, 100)
    world = bpy.data.worlds.new("World")
    bpy.context.scene.world = world
    world.use_nodes = True
    bg = world.node_tree.nodes["Background"]
    bg.inputs[0].default_value = (0.1, 0.1, 0.1, 1.0)


def look_at(cam, target):
    direction = Vector(target) - cam.location
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()


def main():
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    init_scene(args.image_resolution[0], args.image_resolution[1],
               args.number_of_samples)
    load_and_normalize(args.mesh_path)
    add_lights()

    cam_data = bpy.data.cameras.new("Camera")
    cam_data.lens = 45
    cam = bpy.data.objects.new("Camera", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    d = 3.0
    views = [(az, 45) for az in range(0, 360, 45)]
    for i, (azimuth, elevation) in enumerate(views):
        phi = math.radians(azimuth)
        theta = math.radians(elevation)
        cam.location = (d * math.sin(theta) * math.cos(phi),
                        d * math.sin(theta) * math.sin(phi),
                        d * math.cos(theta))
        look_at(cam, (0, 0, 0))
        bpy.context.scene.render.filepath = os.path.join(
            args.output_dir, f"{i:03d}.png")
        bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
