"""Render every generated `object.obj` to 8-view PNGs for evaluation
(driver counterpart of `/root/reference/rendering/mvrender_script.py`).

Prefers Blender if available; falls back to the built-in software
rasterizer (`sin3dm_tpu.rendering.softraster`) when `--blender_path` is
"soft" or the Blender binary is missing — the fallback uses the same 8
camera poses, so SIFID/LPIPS comparisons between generated and reference
sets stay meaningful as long as both use the same renderer.
"""

import argparse
import glob
import os
import shutil
import subprocess
import sys

parser = argparse.ArgumentParser()
parser.add_argument("-s", "--gen_dir", type=str)
parser.add_argument("-g", "--gpu_id", type=int, default=None)
parser.add_argument("-bl", "--blender_path", type=str, default="blender")
args = parser.parse_args()

obj_paths = []
if args.gen_dir is not None and os.path.exists(args.gen_dir):
    obj_paths += glob.glob(os.path.join(args.gen_dir, "**/object.obj"),
                           recursive=True)

if len(obj_paths) == 0:
    print("No obj files found!")
    sys.exit(1)

use_soft = (args.blender_path == "soft"
            or shutil.which(args.blender_path) is None)
if use_soft:
    print("Blender not found -> software rasterizer fallback")

script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "blender_render_multiview.py")
for path in obj_paths:
    path = os.path.abspath(path)
    out_dir = os.path.join(os.path.dirname(path), "renderings")
    print(f"Rendering {path} -> {out_dir}")
    if use_soft:
        from sin3dm_tpu.rendering.softraster import render_multiview
        render_multiview(path, out_dir)
    else:
        cmd = [args.blender_path, "-b", "-P", script, "--",
               "-s", path, "-o", out_dir]
        if args.gpu_id is not None:
            cmd += ["-g", str(args.gpu_id)]
        subprocess.run(cmd, check=True)
