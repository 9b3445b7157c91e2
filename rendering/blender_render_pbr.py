"""Multi-view Blender render for PBR OBJ outputs (counterpart of the
reference `rendering/blender_render_pbr.py`): wires the baked
albedo/metallic/roughness/normal maps from `textures/` into a Principled
BSDF before rendering the standard 8 views.

    blender -b -P blender_render_pbr.py -- -s object.obj -o out_dir
"""

import argparse
import math
import os
import sys

import bpy


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--mesh_path", type=str, required=True)
    parser.add_argument("-o", "--output_dir", type=str, required=True)
    parser.add_argument("--image_resolution", nargs=2, type=int,
                        default=(512, 512))
    parser.add_argument("--number_of_samples", type=int, default=128)
    argv = sys.argv[sys.argv.index("--") + 1:]
    return parser.parse_args(argv)


def wire_pbr_material(obj, tex_dir):
    mat = bpy.data.materials.new("pbr")
    mat.use_nodes = True
    nodes = mat.node_tree.nodes
    links = mat.node_tree.links
    bsdf = nodes["Principled BSDF"]

    def img_node(name, non_color=False):
        path = os.path.join(tex_dir, name)
        if not os.path.exists(path):
            return None
        node = nodes.new("ShaderNodeTexImage")
        node.image = bpy.data.images.load(path)
        if non_color:
            node.image.colorspace_settings.name = "Non-Color"
        return node

    albedo = img_node("albedo.png")
    if albedo:
        links.new(albedo.outputs["Color"], bsdf.inputs["Base Color"])
    metallic = img_node("metallic.png", non_color=True)
    if metallic:
        links.new(metallic.outputs["Color"], bsdf.inputs["Metallic"])
    roughness = img_node("roughness.png", non_color=True)
    if roughness:
        links.new(roughness.outputs["Color"], bsdf.inputs["Roughness"])
    normal = img_node("normal.png", non_color=True)
    if normal:
        nmap = nodes.new("ShaderNodeNormalMap")
        links.new(normal.outputs["Color"], nmap.inputs["Color"])
        links.new(nmap.outputs["Normal"], bsdf.inputs["Normal"])

    obj.data.materials.clear()
    obj.data.materials.append(mat)


def main():
    from blender_render_multiview import (add_lights, init_scene,
                                          load_and_normalize, look_at)
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    init_scene(*args.image_resolution, args.number_of_samples)
    obj = load_and_normalize(args.mesh_path)
    wire_pbr_material(obj, os.path.join(os.path.dirname(args.mesh_path),
                                        "textures"))
    add_lights()

    cam_data = bpy.data.cameras.new("Camera")
    cam_data.lens = 45
    cam = bpy.data.objects.new("Camera", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    d = 3.0
    for i, azimuth in enumerate(range(0, 360, 45)):
        phi = math.radians(azimuth)
        theta = math.radians(45)
        cam.location = (d * math.sin(theta) * math.cos(phi),
                        d * math.sin(theta) * math.sin(phi),
                        d * math.cos(theta))
        look_at(cam, (0, 0, 0))
        bpy.context.scene.render.filepath = os.path.join(
            args.output_dir, f"{i:03d}.png")
        bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
