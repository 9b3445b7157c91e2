"""Web demo over pretrained checkpoints — counterpart of the reference
`src/app.py:25-148`: pick a checkpoint dir, draw N samples (DDPM or
DDIM), decode to GLB, and display/serve them.

Two server backends:

* gradio (when installed): the reference's UI, Model3D viewers included,
* stdlib `http.server` fallback (`--http`, or automatic when gradio is
  absent — it is not baked into the TPU image): the same checkpoint
  dropdown + sliders served as a plain HTML form, generated GLBs
  downloadable over HTTP.  Zero dependencies, so the demo is actually
  drivable in this container (exercised by tests/test_e2e.py).
"""

from __future__ import annotations

import argparse
import glob
import json
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


_PAGE = """<!doctype html><html><head><title>Sin3DM-TPU</title>
<style>body{{font-family:sans-serif;max-width:42em;margin:2em auto}}
label{{display:block;margin:.4em 0}}input,select{{margin-left:.5em}}
.glb a{{display:block;margin:.3em 0}}</style></head><body>
<h1>Sin3DM on TPU — single-shape 3D diffusion</h1>
<p>Generation takes a few seconds per batch on one TPU chip once
compiled.  Results appear as downloadable GLB links below.</p>
<form method="post" action="/generate">
<label>checkpoint <select name="tag">{options}</select></label>
<label>samples <input type="number" name="n_samples" value="4" min="1"
 max="4"></label>
<label>seed <input type="number" name="seed" value="0"></label>
<label>DDIM-100 <input type="checkbox" name="use_ddim"></label>
<label>marching cubes resolution <input type="number" name="reso"
 value="256" min="32" max="512"></label>
<label>faces <input type="number" name="n_faces" value="10000"></label>
<label>texture resolution <input type="number" name="texreso"
 value="2048"></label>
<label>resize x/y/z <input name="resize_x" value="1.0" size="4">
<input name="resize_y" value="1.0" size="4">
<input name="resize_z" value="1.0" size="4"></label>
<button type="submit">Generate</button></form>
<div class="glb">{results}</div></body></html>"""


def build_http_server(checkpoints_root: str = "checkpoints",
                      host: str = "127.0.0.1", port: int = 0):
    """Dependency-free demo server (`http.server`).

    Routes: GET / (form), POST /generate (runs :func:`generate`; accepts
    form or JSON bodies; JSON requests get a JSON list of GLB URLs back),
    GET /glb/<i> (download the i-th GLB of the last generation).
    Returns a ThreadingHTTPServer; call .serve_forever() (or drive it
    from a thread in tests).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet CI logs
            pass

        def _page(self, results=""):
            opts = "".join(f'<option value="{c}">{c}</option>'
                           for c in list_checkpoints(checkpoints_root))
            body = _PAGE.format(options=opts, results=results).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/glb/"):
                try:
                    idx = int(self.path.split("/")[2])
                    path = self.server.last_glbs[idx]
                    with open(path, "rb") as f:
                        data = f.read()
                except (IndexError, ValueError, OSError):
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "model/gltf-binary")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self._page()

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n).decode()
            ctype = self.headers.get("Content-Type", "")
            if "json" in ctype:
                q = {k: [v] for k, v in json.loads(raw or "{}").items()}
            else:
                q = parse_qs(raw)
            g = lambda k, d: q.get(k, [d])[0]
            try:
                paths = generate(
                    g("tag", ""), int(g("n_samples", 1)),
                    int(g("seed", 0)), int(g("reso", 256)),
                    int(g("n_faces", 10000)), int(g("texreso", 2048)),
                    float(g("resize_x", 1.0)), float(g("resize_y", 1.0)),
                    float(g("resize_z", 1.0)),
                    str(g("use_ddim", "")).lower() in ("on", "true", "1"))
            except Exception as e:  # surface errors to the client
                self.send_error(500, str(e)[:200])
                return
            self.server.last_glbs = [p for p in paths if os.path.exists(p)]
            urls = [f"/glb/{i}" for i in range(len(self.server.last_glbs))]
            if "json" in ctype:
                body = json.dumps({"glbs": urls}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                links = "".join(
                    f'<a href="{u}">sample {i} (GLB)</a>'
                    for i, u in enumerate(urls)) or "no samples decoded"
                self._page(results=links)

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.last_glbs = []
    return srv


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoints", type=str, default="checkpoints")
    parser.add_argument("--share", action="store_true")
    parser.add_argument("--http", action="store_true",
                        help="serve the stdlib HTTP UI even if gradio "
                             "is installed")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    try:
        if args.http:
            raise ImportError
        import gradio as gr
    except ImportError:
        srv = build_http_server(args.checkpoints, host="0.0.0.0",
                                port=args.port)
        if not args.http:
            print("gradio is not installed — serving the stdlib HTTP UI "
                  "instead")
        print(f"serving on http://{srv.server_address[0]}:"
              f"{srv.server_address[1]}")
        srv.serve_forever()
        return

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
