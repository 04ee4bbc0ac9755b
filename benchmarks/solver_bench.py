#!/usr/bin/env python
"""CPO constrained trust-region solver benchmark, with on-chip phase breakdown.

Times the full CPO update program and its phases at the reference's
production scale (steps_per_epoch=20000 batch, 64x64 nets,
SafetyPointGoal1-v0 obs) — the BASELINE.json north-star "CPO CG + dual-QP +
line-search solve ms":

* ``grads``        — policy gradient g and cost gradient b (2 full-batch
                     reverse passes);
* ``cg``           — both conjugate-gradient solves (2 x cg_iters
                     jvp-of-grad Fisher-vector products on the fvp
                     subsample);
* ``dual_qp``      — the branch-free 5-case dual QP (scalar work);
* ``line_search``  — the 20-candidate vmapped search (each candidate
                     re-evaluates full-batch reward/cost losses + KL);
* ``critic_sweep`` — the reward+cost critic minibatch SGD sweep;
* ``full``         — the complete jitted update program.

Timing discipline (see ops/pallas_scan.py history): phases are timed as
dependency CHAINS inside one jit (a scalar derived from each iteration's
output perturbs the next iteration's input), the scalar result is value-
fetched, and every timed call gets a fresh input — defeating per-call
dispatch cost, lazy completion, and value-caching on the tunneled chip.

A speed-of-light note is printed per phase: at 64x64 MLP scale the solver's
arithmetic is microseconds of MXU time (the script prints the FLOP count
and implied utilization), so the measured time is sequential-step latency —
cg_iters and line-search rounds of small kernels — not bandwidth or FLOPs.
That is the correct regime for this solver: the reference pays the same
serialization PLUS a Python/autograd round trip per step.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _chain_time(fn, example, reps=100, trials=5):
    """Median time per invocation of ``fn`` (a jitted scalar-output fn of a
    scalar perturbation), measured as a reps-deep dependency chain with
    value fetch and fresh inputs."""

    @functools.partial(jax.jit, static_argnames='n')
    def chained(x0, n):
        def body(x, _):
            out = fn(x)
            return (out * 1e-12 + x0) * 0.5 + x * 1e-6, ()
        x, _ = jax.lax.scan(body, x0, None, length=n)
        return x

    float(chained(jnp.asarray(0.0), reps))  # compile
    times = []
    for i in range(trials):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(1e-8 * (i + 1)), reps))
        times.append((time.perf_counter() - t0) / reps)
    times.sort()
    return times[len(times) // 2] * 1000.0  # ms

def main() -> None:  # pylint: disable=too-many-locals,too-many-statements
    import omnisafe_tpu
    from omnisafe_tpu.ops.trust_region import (
        cpo_case_and_direction,
        flatten_params,
        line_search,
        make_fvp,
    )
    from omnisafe_tpu.utils.math import conjugate_gradients

    agent = omnisafe_tpu.Agent('CPO', 'SafetyPointGoal1-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 40000, 'vector_env_nums': 16},
        'algo_cfgs': {'steps_per_epoch': 20000},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_solver_bench'},
    })
    algo = agent.agent
    state = algo._init_train_state()  # pylint: disable=protected-access
    rollout_jit = jax.jit(algo._rollout_program)  # pylint: disable=protected-access
    update_jit = jax.jit(algo._update_program)  # pylint: disable=protected-access

    state, batch, _, _ = rollout_jit(state)
    jax.block_until_ready(batch.obs)
    Jc, lr = jnp.asarray(30.0), jnp.asarray(1e-3)

    algo_cfg = algo.cfgs.algo_cfgs
    ac = algo._actor_critic  # pylint: disable=protected-access
    params = state.params
    flat = batch  # flattened (N, ...) batch from the rollout program
    obs = flat.obs.reshape(-1, flat.obs.shape[-1])
    act = flat.act.reshape(-1, flat.act.shape[-1])
    logp = flat.logp.reshape(-1)
    adv_r = flat.adv_r.reshape(-1)
    adv_c = flat.adv_c.reshape(-1)
    theta, unravel = flatten_params(params.actor)
    n_params = int(theta.size)
    n_batch = int(obs.shape[0])

    def loss_r_at(flat_theta):
        loss, _ = algo._loss_pi(unravel(flat_theta), None, obs, act, logp, adv_r)  # pylint: disable=protected-access
        return loss

    def loss_c_at(flat_theta):
        return algo._loss_pi_cost(unravel(flat_theta), obs, act, logp, adv_c)  # pylint: disable=protected-access

    fvp_obs = obs[:: int(algo_cfg.fvp_sample_freq)]
    p_dist_fvp = ac.actor.apply(params.actor, fvp_obs)

    def kl_at(flat_theta):
        dist = ac.actor.apply(unravel(flat_theta), fvp_obs)
        return jnp.mean(p_dist_fvp.kl(dist))

    cg_iters = int(algo_cfg.cg_iters)
    fvp = make_fvp(kl_at, theta, float(algo_cfg.cg_damping), lambda x: x)
    grads = jax.grad(loss_r_at)(theta)
    b_grads = jax.grad(loss_c_at)(theta)
    x_dir = conjugate_gradients(fvp, grads, cg_iters)

    # ---- phase closures (scalar perturbation in, scalar out) ----
    def phase_grads(eps):
        th = theta + eps
        return jnp.sum(jax.grad(loss_r_at)(th)) + jnp.sum(jax.grad(loss_c_at)(th))

    def phase_cg(eps):
        g = grads + eps
        b2 = b_grads + eps
        x = conjugate_gradients(fvp, g, cg_iters)
        p = conjugate_gradients(fvp, b2, cg_iters)
        return jnp.sum(x) + jnp.sum(p)

    def phase_dual_qp(eps):
        q = jnp.dot(x_dir, fvp(x_dir))
        step_dir, *_ = cpo_case_and_direction(
            x=x_dir + eps, p=x_dir, q=q, r=q * 0.5, s=q * 0.25,
            b_grads=b_grads, ep_costs=Jc - 25.0,
            target_kl=float(algo_cfg.target_kl),
        )
        return jnp.sum(step_dir)

    p_dist = ac.actor.apply(params.actor, obs)
    loss_r0 = loss_r_at(theta)
    loss_c0 = loss_c_at(theta)

    def phase_line_search(eps):
        def eval_candidate(flat_theta):
            loss_r, _ = algo._loss_pi(unravel(flat_theta), None, obs, act, logp, adv_r)  # pylint: disable=protected-access
            loss_c = loss_c_at(flat_theta)
            dist = ac.actor.apply(unravel(flat_theta), obs)
            kl = jnp.mean(p_dist.kl(dist))
            return {'loss': loss_r, 'loss_cost': loss_c, 'kl': kl}

        def accept(stats):
            return (stats['loss'] <= loss_r0) & (stats['loss_cost'] <= loss_c0 + 1.0) \
                & (stats['kl'] <= float(algo_cfg.target_kl))

        result = line_search(eval_candidate, theta + eps, x_dir, accept,
                             total_steps=20, decay=0.8)
        return jnp.sum(result.step)

    def phase_full(eps):
        # perturb obs AND advantages: every phase of the update must depend
        # on eps, else XLA hoists the Jc-independent parts (grads, both CG
        # solves) out of the timing chain as loop-invariant constants —
        # observed as full_update < cg.
        pert = batch.replace(obs=batch.obs * (1.0 + eps),
                             adv_r=batch.adv_r + eps)
        new_state, metrics = update_jit(state, pert, Jc + eps, lr)
        del new_state
        return metrics['Train/KL']

    phases = {
        'null_floor': lambda eps: eps * 2.0 + 1.0,  # chain overhead control
        'grads': phase_grads,
        'cg': phase_cg,
        'dual_qp': phase_dual_qp,
        'line_search': phase_line_search,
        'full_update': phase_full,
    }
    results = {}
    for name, fn in phases.items():
        results[name] = _chain_time(jax.jit(fn), 0.0)
    floor = results.pop('null_floor')
    results = {k: max(v - floor, 0.0) for k, v in results.items()}
    results['chain_floor'] = floor
    results['critic_sweep_and_rest'] = max(
        results['full_update']
        - results['grads'] - results['cg'] - results['dual_qp']
        - results['line_search'],
        0.0,
    )

    # speed-of-light context: total actor-path FLOPs in the solve
    d_obs, d_act = obs.shape[-1], act.shape[-1]
    mlp_flops = 2 * (d_obs * 64 + 64 * 64 + 64 * d_act)  # fwd per sample
    n_fvp = int(fvp_obs.shape[0])
    flops = (
        2 * 3 * n_batch * mlp_flops          # two grads (fwd+bwd ~ 3x fwd)
        + 2 * cg_iters * 4 * n_fvp * mlp_flops  # FVPs (jvp-of-grad ~ 4x fwd)
        + 20 * 4 * n_batch * mlp_flops       # 20 candidates: losses + KL
    )
    solve_ms = results['grads'] + results['cg'] + results['dual_qp'] + results['line_search']
    util = flops / (solve_ms * 1e-3) / 394e12  # v5e bf16 peak
    print(json.dumps({
        'metric': 'cpo_solver_update_ms',
        'value': round(results['full_update'], 2),
        'unit': 'ms (full CPO update, 20k batch; phases in detail field)',
        'vs_baseline': None,
        'detail': {
            **{k: round(v, 3) for k, v in results.items()},
            'params': n_params, 'batch': n_batch, 'fvp_rows': n_fvp,
            'solver_flops': flops,
            'mxu_utilization_of_solve': f'{util:.2e}',
            'regime': 'latency-bound: ~%d sequential small kernels; '
                      'arithmetic is ~%.0f us of MXU time'
                      % (2 * cg_iters + 20 + 4, flops / 394e12 * 1e6),
            'note': 'phases are timed as standalone reconstructions and '
                    'over-count vs the fused full program (cg standalone > '
                    'full_update reproducibly): inside one compiled update '
                    'XLA schedules the CG/FVP kernel sequence tighter than '
                    'the phase harness can.  full_update is the number that '
                    'matters; phase values are upper bounds.',
        },
    }))


if __name__ == '__main__':
    main()
