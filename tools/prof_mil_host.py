# Host-only milrenderer frame-loop profile (device stubbed).
import sys, time, cProfile, pstats, tempfile, pathlib
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bench_milrenderer import build_chart_package, SinkCap

from libnativecpurenderer_tpu.ops import patch_exec, executor
patch_exec.render_flush_unrolled = lambda fb, rows, atlas, sig: fb
patch_exec.frame_step_unrolled = lambda fb0, rows, atlas, sig: jnp.zeros(
    (fb0.shape[0], fb0.shape[1], 4), jnp.uint8)
patch_exec.render_flush = lambda fb, packed, atlas, plan, nbase: fb
executor._run = lambda fb, *a, **k: fb
executor.quantize_u8 = lambda fb, channels=4: jnp.zeros(
    (fb.shape[0], fb.shape[1], 4), jnp.uint8)

from libnativecpurenderer_tpu.apps.milrenderer import Renderer
from libnativecpurenderer_tpu.context import RenderContext

td = tempfile.mkdtemp()
zpath, res = build_chart_package(pathlib.Path(td))
r = Renderer(width=1920, height=1080, fps=60, res_dir=res, silent=True)
r.cap = SinkCap()
N = 240
t0 = time.perf_counter()
r.run(zpath, "/dev/null", progress=False, start_frame=0, end_frame=N)
warm = time.perf_counter() - t0
print(f"warm {warm / N * 1e3:.1f} ms/frame (host-only)")

n0 = r.cap.n
t0 = time.perf_counter()
r.run(zpath, "/dev/null", progress=False, start_frame=0, end_frame=N)
dt = time.perf_counter() - t0
print(f"host-only: {dt / N * 1e3:.2f} ms/frame over {r.cap.n - n0} frames")
rep = {k: round(v, 2) for k, v in r.timer.report().items()}
print("PHASES", rep)

pr = cProfile.Profile(); pr.enable()
r.run(zpath, "/dev/null", progress=False, start_frame=0, end_frame=N)
pr.disable()
st = pstats.Stats(pr); st.sort_stats("tottime"); st.print_stats(28)
