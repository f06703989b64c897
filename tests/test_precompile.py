"""deploy/precompile.py: compile-cache warming.

The contract is that `precompile` builds the SAME programs the pipeline
runs — via the same constructors — so a later run hits the persistent
compile cache instead of paying the multi-minute remote compile.  The
cache-hit test proves it end to end: process A warms a fresh cache,
process B builds the train step the way the pipeline does and executes
it on real arrays, and the cache gains no new entries.
"""

import pytest
import json
import os
import subprocess
import sys

import jax

from adlm_tpu.core.config import get_experiment
from adlm_tpu.deploy.precompile import (
    apply_train_overrides,
    precompile_protoseg,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_precompile_builds_all_programs():
    cfg = get_experiment("smoke")
    times = precompile_protoseg(
        cfg, ["warmup", "joint", "finetune", "val", "fullres", "push"],
        eval_batch=2, push_batch=2, full_res=(80, 96), stats=True,
        log=lambda *_: None)
    assert set(times) == {"train_warmup", "train_joint", "train_finetune",
                          "val_step", "fullres_eval", "push_batched"}
    assert all(t >= 0 for t in times.values())


def test_precompile_unoise_builds_both_steps():
    from adlm_tpu.core.config import UNoiseConfig
    from adlm_tpu.deploy.precompile import precompile_unoise
    cfg = UNoiseConfig(depth=2, channel_factor=2, util_depth=2,
                       util_channel_factor=2, batch_size=2)
    times = precompile_unoise(cfg, res=(32, 32), log=lambda *_: None)
    assert set(times) == {"unoise_util", "unoise_noise"}


def test_precompile_unoise_rng_dtype_matches_pipeline():
    """The noise step is warmed with a (2,) uint32 key SDS — the same
    dtype jax.random.split hands the real pipeline (a mismatch would
    silently miss the cache)."""
    key = jax.random.split(jax.random.PRNGKey(0))[0]
    assert key.shape == (2,) and key.dtype == jnp_uint32()


def jnp_uint32():
    import jax.numpy as jnp
    return jnp.uint32


def test_precompile_overrides_match_cmd_train():
    cfg = get_experiment("smoke")
    out = apply_train_overrides(cfg, bf16=True, fused=True, s2b=True)
    assert out.train.compute_dtype == "bfloat16"
    assert out.train.fused_accumulation is True
    assert out.model.dilated_space_to_batch is True
    # no-op path returns the config unchanged
    assert apply_train_overrides(cfg, False, False, False) is cfg


_COMMON = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
# persist only the big train-step program, not incidental eager ops
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from adlm_tpu.core.config import get_experiment
cfg = get_experiment("smoke")
"""

_WARM = _COMMON + """
from adlm_tpu.deploy.precompile import precompile_protoseg
precompile_protoseg(cfg, ["joint"], log=lambda *_: None)
print("WARMED")
"""

_RUN = _COMMON + """
# build + execute the joint train step exactly like train/pipeline.py
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.train.protoseg import init_protoseg_state, make_train_step
t = cfg.train
model = PPNet(cfg=cfg.model)
wh, ww = cfg.data.window_size
state = init_protoseg_state(model, cfg, 1, t.joint_steps,
                            jax.random.PRNGKey(t.random_seed),
                            jnp.zeros((1, wh, ww, 3), jnp.float32))
step = make_train_step(model, cfg, 1, t.joint_steps, donate=True)
rng = np.random.RandomState(0)
# inputs arrive through the pipeline's ship() casts (ship_dtypes is
# the single source of truth both sides share)
from adlm_tpu.train.pipeline import ship_dtypes
img_dt, lab_dt = ship_dtypes(cfg)
images = jnp.asarray(rng.rand(t.iter_size, t.joint_batch_size, wh, ww, 3
                              ).astype(img_dt))
labels = jnp.asarray(rng.randint(0, 3, size=(t.iter_size,
                                             t.joint_batch_size, wh, ww)
                                 ).astype(lab_dt))
state, metrics = step(state, images, labels)
print("LOSS", float(metrics["loss"]))
"""


def _run_py(src, cwd=REPO):
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run([sys.executable, "-c", src], env=env, cwd=cwd,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _cache_files(cache):
    return sorted(f for f in os.listdir(cache)
                  if not f.startswith("."))


@pytest.mark.slow
def test_precompiled_program_is_a_cache_hit(tmp_path):
    """Warm in one process, run the pipeline-constructed step in
    another: the persistent cache must gain NO new entries (same
    program → same cache key → hit)."""
    cache = str(tmp_path / "jaxcache")
    os.makedirs(cache)
    _run_py(_WARM.format(cache=cache))
    warmed = [f for f in _cache_files(cache) if f.startswith("jit_step")]
    assert warmed, "precompile persisted no train-step program"
    out = _run_py(_RUN.format(cache=cache))
    assert "LOSS" in out
    # the run may persist incidental programs (param initializers); the
    # train step itself must be a hit — no SECOND jit_step entry
    after = [f for f in _cache_files(cache) if f.startswith("jit_step")]
    assert after == warmed, (
        f"train step missed the warmed cache: new entries "
        f"{sorted(set(after) - set(warmed))}")


def test_precompile_cli(tmp_path):
    from adlm_tpu.cli import main
    os.environ["JAX_CACHE_DIR"] = str(tmp_path / "clicache")
    try:
        main(["precompile", "smoke", "--phases", "val"])
    finally:
        os.environ.pop("JAX_CACHE_DIR")
