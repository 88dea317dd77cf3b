"""Denoiser quality measurement (VERDICT r4 'measure the denoiser').

Renders a noisy Cornell box (32 spp, with normal/albedo AOVs), denoises it
with the a-trous feature-guided filter (render/denoiser.py — the OIDN role,
reference denoiser.cxx:60-141), and scores MSE/SSIM against a 4096-spp
ground truth. OIDN itself cannot run here (no external deps on the image);
the published OIDN-class bar for Cornell-like scenes at 32 spp is roughly
a 10-20x MSE reduction — this records where the a-trous filter stands
against that number. Results are written to stdout as JSON and pasted into
PARITY.md.

Run: python -m benchmarks.denoise_eval
"""

from __future__ import annotations

import json
import time

import numpy as np


def ssim(a, b, data_range=None):
  """Mean SSIM over channels, 7x7 uniform window (numpy, no deps)."""
  if data_range is None:
    data_range = max(float(a.max()), float(b.max()), 1e-6)
  c1 = (0.01 * data_range) ** 2
  c2 = (0.03 * data_range) ** 2

  def win_mean(x):
    k = 7
    pad = k // 2
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = np.zeros_like(x)
    for dy in range(k):
      for dx in range(k):
        out += xp[dy:dy + x.shape[0], dx:dx + x.shape[1]]
    return out / (k * k)

  mu_a = win_mean(a)
  mu_b = win_mean(b)
  va = win_mean(a * a) - mu_a ** 2
  vb = win_mean(b * b) - mu_b ** 2
  cov = win_mean(a * b) - mu_a * mu_b
  s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
      (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
  return float(s.mean())


def main():
  import jax
  jax.config.update("jax_compilation_cache_dir", "/tmp/etx_jaxcache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import denoiser, film as film_mod
  from etx_tracer_tpu.scene import cornell

  size = 128
  b = cornell.build_cornell_box(film_size=(size, size), diffuse_only=True,
                                max_path_length=8)
  scene, config = b.build()

  # ground truth: 4096 spp through the pooled renderer
  sums, _ = path_tracing.render_samples_compiled(scene, config, 0, 4096,
                                                 pool_size=1 << 16)
  gt = np.asarray(path_tracing.finalize_film(sums, 4096, size).camera)

  for spp in (4, 32):
    # noisy render WITH AOVs (render_iteration fills normals/albedo layers)
    fs = path_tracing.render(scene, config, iterations=spp)
    noisy = np.asarray(film_mod.result_image(fs))
    rows = []
    e_noisy = ((noisy - gt) ** 2).mean(-1)
    # robust view: the image-mean MSE is dominated by emitter-EDGE
    # partial-coverage pixels (binary at low spp) that NO classical
    # edge-preserving filter can fix — report interior percentiles too
    thr = np.percentile(e_noisy, 95)
    interior = e_noisy < thr
    for its in (1, 2, 3, 5):
      den = np.asarray(denoiser.denoise_film(fs, iterations=its))
      e_den = ((den - gt) ** 2).mean(-1)
      rows.append((its, float(e_den.mean()), ssim(den, gt),
                   float(e_den[interior].mean()),
                   float(np.percentile(e_den, 50))))
    mse_noisy = float(e_noisy.mean())
    best = min(rows, key=lambda r: r[3])
    out = {
        "spp": spp,
        "mse_noisy": mse_noisy,
        "mse_noisy_excl_top5pct": float(e_noisy[interior].mean()),
        "p50_noisy": float(np.percentile(e_noisy, 50)),
        "ssim_noisy": ssim(noisy, gt),
        "per_depth": [{"atrous_levels": r[0], "mse": r[1], "ssim": r[2],
                       "mse_excl_top5pct": r[3], "p50": r[4]}
                      for r in rows],
        "best_mse_reduction_x_overall": mse_noisy / max(best[1], 1e-12),
        "best_mse_reduction_x_excl_top5pct":
            float(e_noisy[interior].mean()) / max(best[3], 1e-12),
        "oidn_class_published_mse_reduction_x": "10-20 (typical, for context)",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
  main()
