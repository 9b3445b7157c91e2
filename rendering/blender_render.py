"""Single paper-figure Blender render (counterpart of the reference
`rendering/blender_render.py`): one 3/4 view with ground shadow.

    blender -b -P blender_render.py -- -s mesh.obj -o out.png
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
    parser.add_argument("-o", "--output", type=str, required=True)
    parser.add_argument("--image_resolution", nargs=2, type=int,
                        default=(1024, 1024))
    parser.add_argument("--number_of_samples", type=int, default=200)
    parser.add_argument("--azimuth", type=float, default=45.0)
    parser.add_argument("--elevation", type=float, default=55.0)
    parser.add_argument("--distance", type=float, default=3.0)
    argv = sys.argv[sys.argv.index("--") + 1:]
    return parser.parse_args(argv)


def main():
    from blender_render_multiview import (add_lights, init_scene,
                                          load_and_normalize, look_at)
    args = parse_args()
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    init_scene(*args.image_resolution, args.number_of_samples)
    obj = load_and_normalize(args.mesh_path)

    # ground plane for contact shadow
    bpy.ops.mesh.primitive_plane_add(size=20, location=(0, 0, -1.0))
    plane = bpy.context.object
    mat = bpy.data.materials.new("ground")
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    bsdf.inputs["Base Color"].default_value = (1, 1, 1, 1)
    bsdf.inputs["Roughness"].default_value = 1.0
    plane.data.materials.append(mat)

    add_lights()

    cam_data = bpy.data.cameras.new("Camera")
    cam_data.lens = 45
    cam = bpy.data.objects.new("Camera", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    phi = math.radians(args.azimuth)
    theta = math.radians(args.elevation)
    d = args.distance
    cam.location = (d * math.sin(theta) * math.cos(phi),
                    d * math.sin(theta) * math.sin(phi),
                    d * math.cos(theta))
    look_at(cam, (0, 0, 0))

    bpy.context.scene.render.filepath = args.output
    bpy.ops.render.render(write_still=True)
    del obj


if __name__ == "__main__":
    main()
