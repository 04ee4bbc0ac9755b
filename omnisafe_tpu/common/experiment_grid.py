"""Experiment grid: cartesian hyperparameter sweeps.

Counterpart of the reference's ``ExperimentGrid`` (reference:
omnisafe/common/experiment_grid.py:36-642): add keys/values, generate
shorthand variant names, run every variant through a process pool, analyze
results from the produced ``progress.csv`` files.  GPU round-robin becomes a
no-op here — variants share the single TPU chip serially by default
(``num_pool=1``); CPU-only sweeps can parallelize.

Robustness parity with the reference:

* an existing experiment dir with a *different* grid config is refused
  instead of silently overwritten (reference: experiment_grid.py:419-427);
* results bookkeeping is incremental — ``results.json`` is rewritten after
  every variant, and re-running the same grid skips variants that already
  completed, so an interrupted sweep resumes where it stopped;
* ``evaluate``/``render`` run the Evaluator post-hoc over every variant's
  saved checkpoints (reference: experiment_grid.py:540-642).
"""

from __future__ import annotations

import glob
import json
import os
from concurrent.futures import ProcessPoolExecutor
from multiprocessing import get_context
from typing import Any, Callable, Dict, List, Optional


def _variant_name(variant: Dict[str, Any]) -> str:
    """Shorthand naming like the reference (experiment_grid.py:204-275)."""
    parts = []
    for key in sorted(variant):
        short = ''.join(w[:3] for w in key.split(':')[-1].split('_'))
        val = variant[key]
        sval = str(val).replace(' ', '').replace('[', '').replace(']', '').replace(',', '-')
        parts.append(f'{short}_{sval}')
    return '---'.join(parts)[:128]


def _set_nested(cfg: Dict[str, Any], key: str, value: Any) -> None:
    parts = key.split(':')
    node = cfg
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _run_variant(args):
    train_fn, exp_dir, name, variant = args
    variant = dict(variant)
    algo = variant.pop('algo')
    env_id = variant.pop('env_id')
    custom: Dict[str, Any] = {}
    for key, value in variant.items():
        _set_nested(custom, key, value)
    custom.setdefault('logger_cfgs', {})['log_dir'] = os.path.join(exp_dir, name)
    try:
        result = train_fn(algo, env_id, custom)
        return name, result, None
    except Exception as exc:  # pylint: disable=broad-except
        return name, None, repr(exc)


def default_train(algo: str, env_id: str, custom_cfgs: Dict[str, Any]):
    """Train one variant (used by the CLI benchmark command)."""
    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    agent = omnisafe_tpu.Agent(algo, env_id, custom_cfgs=custom_cfgs)
    return agent.learn()


class ExperimentGrid:
    """Cartesian sweep over config keys (use ':' for nesting, e.g.
    ``algo_cfgs:steps_per_epoch``)."""

    def __init__(self, exp_name: str = 'exp') -> None:
        self.exp_name = exp_name
        self.keys: List[str] = []
        self.vals: List[List[Any]] = []

    def add(self, key: str, vals: Any) -> 'ExperimentGrid':
        """(reference: experiment_grid.py:277-330)."""
        if not isinstance(vals, list):
            vals = [vals]
        self.keys.append(key)
        self.vals.append(vals)
        return self

    def variants(self) -> List[Dict[str, Any]]:
        """(reference: experiment_grid.py:332-385)."""
        out: List[Dict[str, Any]] = [{}]
        for key, vals in zip(self.keys, self.vals):
            out = [{**variant, key: val} for variant in out for val in vals]
        return out

    def _grid_config(self) -> Dict[str, Any]:
        return {'keys': self.keys, 'vals': self.vals}

    # pylint: disable-next=too-many-locals,too-many-branches
    def run(
        self,
        train_fn: Callable[[str, str, Dict[str, Any]], Any] = default_train,
        num_pool: int = 1,
        exp_dir: Optional[str] = None,
        force: bool = False,
    ) -> Dict[str, Any]:
        """Run (or resume) every variant.

        An existing experiment dir is refused when its saved grid config
        differs from this grid (pass ``force=True`` to override); when it
        matches, completed variants are skipped so an interrupted sweep
        resumes (reference: experiment_grid.py:387-473, 419-427).
        """
        assert 'algo' in self.keys and 'env_id' in self.keys, (
            'grid must include algo and env_id keys'
        )
        exp_dir = exp_dir or os.path.join('./runs', self.exp_name)
        cfg_path = os.path.join(exp_dir, 'grid_config.json')
        results_path = os.path.join(exp_dir, 'results.json')
        grid_cfg = json.loads(json.dumps(self._grid_config(), default=str))
        if os.path.exists(cfg_path) and not force:
            with open(cfg_path, encoding='utf-8') as f:
                existing = json.load(f)
            if existing != grid_cfg:
                raise FileExistsError(
                    f'{exp_dir} already holds a DIFFERENT experiment grid; '
                    'choose a new exp_dir or pass force=True to overwrite'
                )
        os.makedirs(exp_dir, exist_ok=True)
        with open(cfg_path, 'w', encoding='utf-8') as f:
            json.dump(grid_cfg, f, indent=2)

        # resume bookkeeping: completed variants (no error) are skipped
        results: Dict[str, Any] = {}
        if os.path.exists(results_path) and not force:
            with open(results_path, encoding='utf-8') as f:
                results = json.load(f)

        def flush() -> None:
            with open(results_path, 'w', encoding='utf-8') as f:
                json.dump(results, f, indent=2, default=str)

        jobs = []
        for v in self.variants():
            name = _variant_name(v)
            if results.get(name, {}).get('error', '__missing__') is None:
                continue  # already completed
            jobs.append((train_fn, exp_dir, name, v))

        if num_pool <= 1:
            for job in jobs:
                name, result, err = _run_variant(job)
                results[name] = {'result': result, 'error': err}
                flush()
        else:
            with ProcessPoolExecutor(
                max_workers=num_pool, mp_context=get_context('spawn')
            ) as pool:
                for name, result, err in pool.map(_run_variant, jobs):
                    results[name] = {'result': result, 'error': err}
                    flush()
        return results

    # ------------------------------------------------------------ post-hoc
    @staticmethod
    def _variant_run_dirs(exp_dir: str) -> Dict[str, str]:
        """Map variant-relative seed dirs -> absolute run dirs."""
        out: Dict[str, str] = {}
        for cfg in glob.glob(os.path.join(exp_dir, '**', 'config.json'), recursive=True):
            run_dir = os.path.dirname(cfg)
            if glob.glob(os.path.join(run_dir, 'save', '*.msgpack')):
                out[os.path.relpath(run_dir, exp_dir)] = run_dir
        return out

    @classmethod
    def evaluate(cls, exp_dir: str, num_episodes: int = 5) -> Dict[str, Any]:
        """Evaluate every variant's saved policy post-hoc
        (reference: experiment_grid.py:540-597)."""
        from omnisafe_tpu.evaluator import Evaluator  # pylint: disable=import-outside-toplevel

        out: Dict[str, Any] = {}
        for rel, run_dir in cls._variant_run_dirs(exp_dir).items():
            evaluator = Evaluator()
            evaluator.load_saved(run_dir)
            ret, cost, length = evaluator.evaluate(num_episodes=num_episodes)
            out[rel] = {'reward': ret, 'cost': cost, 'length': length}
        path = os.path.join(exp_dir, 'evaluation.json')
        with open(path, 'w', encoding='utf-8') as f:
            json.dump(out, f, indent=2)
        return out

    @classmethod
    def render(cls, exp_dir: str, num_episodes: int = 1) -> Dict[str, str]:
        """Render every variant's saved policy post-hoc
        (reference: experiment_grid.py:599-642)."""
        from omnisafe_tpu.evaluator import Evaluator  # pylint: disable=import-outside-toplevel

        out: Dict[str, str] = {}
        for rel, run_dir in cls._variant_run_dirs(exp_dir).items():
            evaluator = Evaluator()
            evaluator.load_saved(run_dir)
            replay_dir = os.path.join(run_dir, 'replay')
            evaluator.render(num_episodes=num_episodes, save_replay_path=replay_dir)
            out[rel] = replay_dir
        return out

    @staticmethod
    def analyze(exp_dir: str, metric: str = 'Metrics/EpRet') -> Dict[str, float]:
        """Final-window metric per variant (reference: experiment_grid.py:540-642)."""
        import csv  # pylint: disable=import-outside-toplevel

        out: Dict[str, float] = {}
        for root, _, files in os.walk(exp_dir):
            if 'progress.csv' in files:
                with open(os.path.join(root, 'progress.csv'), encoding='utf-8') as f:
                    rows = list(csv.DictReader(f))
                if rows and metric in rows[-1]:
                    rel = os.path.relpath(root, exp_dir)
                    out[rel] = float(rows[-1][metric])
        return out


__all__ = ['ExperimentGrid', 'default_train']
