"""Gradio web demo over pretrained checkpoints — counterpart of the
reference `src/app.py:25-148`: pick a checkpoint dir, draw N samples
(DDPM or DDIM), decode to GLB, and display them.

Gradio is an optional dependency (not baked into the TPU image); the CLI
exits with a clear message when it is missing.
"""

from __future__ import annotations

import argparse
import glob
import os
import types


def list_checkpoints(root: str = "checkpoints"):
    return sorted([d for d in glob.glob(os.path.join(root, "*"))
                   if os.path.isdir(os.path.join(d, "diffusion"))])


def generate(tag: str, n_samples: int, seed: int, reso: int, n_faces: int,
             texreso: int, resize_x: float, resize_y: float,
             resize_z: float, use_ddim: bool):
    """Sample + decode, returning the GLB paths (`src/app.py:25-88`)."""
    from ..core import config as cfgmod
    from ..core.compile_cache import enable_compilation_cache
    from ..core.rng import seed_all
    from .sample import generate as sample_generate

    enable_compilation_cache()
    seed_all(seed)
    args = types.SimpleNamespace(
        tag=tag, n_samples=n_samples, output="app_results",
        resize=(resize_x, resize_y, resize_z), use_ddim=use_ddim,
        timestep_respacing="ddim100" if use_ddim else "",
        reso=reso, n_faces=n_faces, texreso=texreso, vox=False,
        copy_mtl=False, file_format="glb", seed=seed, app="generate",
        data_path=None, pipeline_chunk=1)
    cfgmod.load_and_overwrite_args(
        args, os.path.join(cfgmod.encoding_log_dir(tag), "args.json"))
    cfgmod.load_and_overwrite_args(
        args, os.path.join(cfgmod.diffusion_log_dir(tag), "args.json"),
        ignore_keys=["timestep_respacing"])
    # pipelined sample+decode: chunk i+1's reverse chain runs on the
    # device while chunk i's mesh geometry runs on the host
    paths = sample_generate(args)
    return [os.path.join(os.path.dirname(p), "object.glb") for p in paths]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoints", type=str, default="checkpoints")
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment. The app CLI "
            "needs it: use `python -m sin3dm_tpu.cli.sample` for "
            "programmatic sampling instead.")

    ckpts = list_checkpoints(args.checkpoints)

    with gr.Blocks(title="Sin3DM-TPU") as demo:
        gr.Markdown("# Sin3DM on TPU — single-shape 3D diffusion\n"
                    "Generation takes a few seconds per batch on one "
                    "TPU chip once compiled.")
        with gr.Row():
            tag = gr.Dropdown(choices=ckpts, label="checkpoint",
                              value=ckpts[0] if ckpts else None)
        with gr.Row():
            n_samples = gr.Slider(1, 4, value=4, step=1, label="samples")
            seed = gr.Slider(0, 10000, value=0, step=1, label="seed")
            use_ddim = gr.Checkbox(value=False, label="DDIM-100")
        with gr.Row():
            reso = gr.Slider(64, 512, value=256, step=64,
                             label="marching cubes resolution")
            n_faces = gr.Slider(2000, 100000, value=10000, step=1000,
                                label="faces")
            texreso = gr.Slider(512, 4096, value=2048, step=512,
                                label="texture resolution")
        with gr.Row():
            rx = gr.Slider(0.5, 2.0, value=1.0, step=0.1, label="resize x")
            ry = gr.Slider(0.5, 2.0, value=1.0, step=0.1, label="resize y")
            rz = gr.Slider(0.5, 2.0, value=1.0, step=0.1, label="resize z")
        run_btn = gr.Button("Generate")
        outputs = [gr.Model3D(label=f"sample {i}") for i in range(4)]

        def _run(tag, n, seed, reso, n_faces, texreso, rx, ry, rz, ddim):
            paths = generate(tag, int(n), int(seed), int(reso),
                             int(n_faces), int(texreso), rx, ry, rz, ddim)
            paths = paths + [None] * (4 - len(paths))
            return paths[:4]

        run_btn.click(_run, [tag, n_samples, seed, reso, n_faces, texreso,
                             rx, ry, rz, use_ddim], outputs)

    demo.launch(share=args.share)


if __name__ == "__main__":
    main()
