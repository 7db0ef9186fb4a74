"""End-to-end TRAINING throughput benchmark: the fused rollout + replay +
learner superstep, trained-env-steps/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Unlike bench.py (env engine only), this measures the full flagship training
path: TD3 over the MODUL framework with equivariant actors/critics (DTDE),
one learner update (batch = num_envs) per env tick, fused into the shard_map
superstep the unified driver runs (parallel/train_step.py).  vs_baseline is
against BASELINE.md's 10M env-steps/s north star — here counted only while
actually learning at a 1:1 update-per-tick cadence (the reference's own
ratio: one batch-256 update per env step, main.py:184-187).

Flags: --num_envs N --rollout_len L --mlp (MONO MLP variant) --updates U.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import sac as sac_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import ppo_models, sac_models, td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_ppo_superstep,
                                               make_sharded_td3_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

TARGET = 1e7  # trained-env-steps/s north star (BASELINE.json)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--rollout_len", type=int, default=50)
    p.add_argument("--updates", type=int, default=0,
                   help="learner updates per superstep (0 = rollout_len, "
                        "i.e. one update per env tick)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="update batch (0 = num_envs)")
    p.add_argument("--mlp", action="store_true",
                   help="bench MONO + plain MLP instead of MODUL + EMLP")
    p.add_argument("--algo", choices=("td3", "sac", "ppo"), default="td3",
                   help="algorithm family: td3 (default), sac (same "
                        "off-policy superstep with sampled-action act_fn + "
                        "sac train_fn), ppo (on-policy superstep: "
                        "rollout_len-tick horizon + GAE + K_epochs)")
    p.add_argument("--fold", action="store_true",
                   help="fold the equivariant projection per optimizer step "
                        "(cfg.equiv_fold) instead of projecting every "
                        "forward (SURVEY §7.5)")
    p.add_argument("--iters", type=int, default=0,
                   help="extra supersteps in the slope measurement's long "
                        "chain (0 = sized for ~6 s of device work; set "
                        "explicitly for CPU smokes)")
    p.add_argument("--warm", action="store_true",
                   help="measure the warm (rollout+replay only, no learner) "
                        "variant — the breakdown baseline")
    p.add_argument("--ppo_mb_per_epoch", type=int, default=55,
                   help="PPO minibatches per epoch per net; minibatch size "
                        "= T_horizon // this.  55 preserves the reference's "
                        "update count per horizon (ceil(7000/128), "
                        "args_parse.py:65,72) while scaling the batch with "
                        "the env count — the data-parallel scaling of its "
                        "schedule.  0 = keep the reference's absolute "
                        "minibatch size (128), which at a 204800-sample "
                        "horizon means 64000 sequential batch-128 updates "
                        "per superstep")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of the measured loop")
    args = p.parse_args(argv)

    n_updates = args.updates or args.rollout_len
    batch = args.batch_size or args.num_envs
    kw = dict(rl_algo=args.algo.upper(), num_envs=args.num_envs,
              batch_size=batch, replay_buffer_size=1_000_000, max_steps=4000,
              T_horizon=args.num_envs * args.rollout_len)
    if args.algo == "ppo" and args.ppo_mb_per_epoch:
        mb = max(kw["T_horizon"] // args.ppo_mb_per_epoch, 1)
        kw.update(actor_batch_size=mb, critic_batch_size=mb)
    if args.mlp:
        cfg = Config(framework="MONO", use_equiv=False, **kw)
    else:
        cfg = Config(framework="MODUL", module_training="DTDE",
                     use_equiv=True, equiv_fold=args.fold, **kw)

    mesh = mesh_lib.make_mesh()
    model_fns = {"td3": td3_models, "sac": sac_models, "ppo": ppo_models}
    agent_cls = {"td3": td3_lib.TD3Agent, "sac": sac_lib.SACAgent,
                 "ppo": ppo_lib.PPOAgent}
    agents = [agent_cls[args.algo](cfg, i, model_fns[args.algo](cfg, i))
              for i in range(cfg.n_agents)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    on_policy = args.algo == "ppo"
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0),
                                       with_replay=not on_policy)
    ep_ret = init_ep_ret(cfg, mesh)

    if on_policy:
        if args.warm:
            p.error("--warm is an off-policy warmup variant (TD3/SAC only)")
        # one superstep = one T_horizon segment + K_epochs of minibatches
        n_updates = cfg.K_epochs
        ppo_step = make_sharded_ppo_superstep(cfg, agents, mesh,
                                              rollout_len=args.rollout_len)

        def step(bstate, obs, rstate, states, ep_ret, key, noise_std,
                 warm=False):
            bstate, obs, states, ep_ret, metrics = ppo_step(
                bstate, obs, states, ep_ret, key)
            return bstate, obs, rstate, states, ep_ret, metrics
    else:
        act_fn = act_prep = train_fn = None
        if args.algo == "sac":
            train_fn = sac_lib.train_step

            def act_prep(states):
                return [a.fold_actor(states[i].actor)
                        for i, a in enumerate(agents)]

            def act_fn(folded, ob, noise_std, k):
                acts = []
                for i, a in enumerate(agents):
                    k, sub = jax.random.split(k)
                    acts.append(a.choose_action_f(folded[i], ob[i], sub))
                return jnp.concatenate(acts, axis=-1)

        step = make_sharded_td3_superstep(
            cfg, agents, mesh, rollout_len=args.rollout_len,
            n_updates=n_updates, train_fn=train_fn, act_fn=act_fn,
            act_prep=act_prep)

    def barrier(states, metrics):
        """Real device-completion barrier: host TRANSFERS of reductions
        over the most-downstream outputs (learner params + rollout
        metrics).  jax.block_until_ready is a NO-OP through the axon
        tunnel (scripts/block_semantics_probe.py), and a device executes
        whole programs in order, so transferring outputs of the LAST
        chained call fences the entire sequence — including every
        learner update."""
        s = float(jnp.sum(jax.tree.leaves(states[0].actor)[0]))
        s += float(metrics["mean_reward"])
        return s

    warm = args.warm
    # warmup/compile
    bstate, obs, rstate, states, ep_ret, metrics = step(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1), 0.1,
        warm=warm)
    barrier(states, metrics)

    steps_per_call = cfg.num_envs * args.rollout_len

    # Two-point slope measurement (see bench.py): one fence transfer costs
    # a tunnel round trip (~32 ms), so rate = extra_work / (dt_long -
    # dt_short) over a short and a long chain of the same compiled call —
    # the RTT cancels.  --iters fixes the long chain's extra length (CPU
    # smokes); otherwise it is sized for ~6 s of extra device work.
    def timed_chain(iters, seed0):
        nonlocal bstate, obs, rstate, states, ep_ret, metrics
        t0 = time.perf_counter()
        for i in range(iters):
            bstate, obs, rstate, states, ep_ret, metrics = step(
                bstate, obs, rstate, states, ep_ret,
                jax.random.PRNGKey(seed0 + i), 0.1, warm=warm)
        barrier(states, metrics)
        return time.perf_counter() - t0

    iters_a = 1
    dt_cal = timed_chain(iters_a, 100)
    extra = args.iters or min(200, max(2, int(6.0 / max(dt_cal, 1e-3))))
    rate = 0.0
    prof = None
    for rep in range(2):  # best of two slopes: sheds transient contention
        if args.profile_dir and rep == 1 and prof is None:
            jax.profiler.start_trace(args.profile_dir)
            prof = True
        dt_a = timed_chain(iters_a, 200 + 50 * rep)
        dt_b = timed_chain(iters_a + extra, 300 + 500 * rep)
        rate = max(rate, steps_per_call * extra / (dt_b - dt_a))
    if prof:
        jax.profiler.stop_trace()

    print(json.dumps({
        "metric": "trained_env_steps_per_sec",
        "value": rate,
        "unit": "steps/s",
        "vs_baseline": rate / TARGET,
        "num_envs": cfg.num_envs,
        "rollout_len": args.rollout_len,
        "updates_per_superstep": n_updates,
        "update_batch": batch,
        "model": ("MONO-MLP" if args.mlp else "MODUL-EMLP-DTDE")
                 + "-" + args.algo.upper(),
        "equiv_fold": bool(args.fold),
        "updates_per_sec": 0.0 if warm else rate / steps_per_call * n_updates,
        "warm_rollout_only": warm,
    }))


if __name__ == "__main__":
    main()
