"""Multi-process launch: the reference tests distributed by actually
spawning two local gloo ranks (reference: tests/test_utils.py:91-92 →
distribution_train.py under torchrun); same strategy here with
``parallel/launch.py`` over two coordinated JAX processes on CPU.

Runs in a clean subprocess tree (the pytest process already initialized a
single-process JAX runtime, which cannot join a multi-process one)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.full
def test_two_process_training(tmp_path):
    script = os.path.join(os.path.dirname(__file__), 'distribution_train.py')
    out_path = os.path.join(str(tmp_path), 'result.json')
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    proc = subprocess.run(
        [sys.executable, script, out_path],
        env=env, timeout=600, capture_output=True, text=True,
    )
    assert proc.returncode == 0, f'stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}'
    with open(out_path, encoding='utf-8') as handle:
        result = json.load(handle)
    assert np.isfinite(result['ret']) and np.isfinite(result['cost'])
    # rank 0 wrote a complete run dir, with GLOBAL-state checkpoints
    run_dir = result['log_dir']
    assert os.path.exists(os.path.join(run_dir, 'progress.csv'))
    saves = os.listdir(os.path.join(run_dir, 'save'))
    assert any(name.startswith('epoch-') or name == 'final.msgpack'
               for name in saves), saves
