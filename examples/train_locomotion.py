"""Train the ragdoll standing/locomotion policy with on-device PPO — the
workflow of the reference's learning/learn_locomotion.py:58-116 (SB3 PPO over
16 subprocess envs, best-model checkpointing, resume support), rebuilt as one
XLA program over vmapped envs.

Run:  python examples/train_locomotion.py --iters 20   (from the repo root)
      (add --resume to continue from the latest checkpoint)
"""

from __future__ import annotations

import os
import sys

# make the repo importable when run as a script; do NOT set PYTHONPATH for
# this (it would shadow the container's /root/.axon_site sitecustomize and
# break TPU registration — see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--unroll", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--solver-iterations", type=int, default=30)
    ap.add_argument("--solver-mode", default="fused",
                    help="fused = whole contact pipeline in one Pallas "
                         "kernel (ops/pallas/fused_step.py)")
    ap.add_argument("--walk-target", type=float, default=0.0,
                    help="torso x-velocity target in m/s (DReCon vcm term, "
                         "learned_locomotion.cpp:345); 0 = standing task")
    ap.add_argument("--curriculum-stages", type=int, default=0,
                    help="N>0 ramps the walk target to walk-target over N "
                         "equal stages of THIS run (stage 1 trains at "
                         "walk-target/N; env re-jits per stage; a resumed "
                         "run restarts the ramp)")
    ap.add_argument("--ckpt-dir", default="/tmp/dxk_loco_ckpt")
    ap.add_argument("--csv", default="/tmp/dxk_loco_train.csv")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the env axis over ALL visible devices "
                         "(jax.sharding Mesh; params replicate, grads "
                         "psum over ICI) — the zero-code-change multi-chip "
                         "path (SURVEY §2.7/§5.8). num-envs must divide "
                         "by the device count.")
    args = ap.parse_args()

    import jax
    # persistent compilation cache: curriculum stages re-jit (one program
    # per walk target) and resumed runs recompile — cache entries make
    # both ~free after the first run
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DXK_TRAIN_CACHE",
                                     "/tmp/dxk_tpu_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from dxk_tpu.envs.loco_env import LocoEnv
    from dxk_tpu.train.ppo import PPOConfig, make_train
    from dxk_tpu.utils.checkpoint import BestModelTracker, Checkpointer
    from dxk_tpu.utils.profiling import StatsLogger, sync

    on_tpu = jax.devices()[0].platform != "cpu"
    num_envs = args.num_envs or (1024 if on_tpu else 16)

    config = PPOConfig(num_envs=num_envs, unroll_length=args.unroll,
                       learning_rate=args.lr,
                       num_minibatches=max(4, num_envs // 64))

    mesh = None
    if args.mesh:
        from dxk_tpu.parallel.mesh import make_env_mesh
        mesh = make_env_mesh()
        assert num_envs % mesh.size == 0, (num_envs, mesh.size)
        print(f"mesh: sharding {num_envs} envs over {mesh.size} devices")

    def make_step(target):
        # gait is pinned to the RUN's walk-target (not the stage's) so the
        # obs size (66 vs 68 with phase features) is stable across
        # curriculum stages and checkpoints stay compatible
        env = LocoEnv(solver_iterations=args.solver_iterations,
                      solver_mode=args.solver_mode,
                      narrow_caps={(1, 1): 24, (1, 3): 20, (3, 3): 3},
                      torso_velocity_target=(target, 0.0, 0.0),
                      gait=(args.walk_target != 0.0))
        if mesh is not None:
            from dxk_tpu.parallel.mesh import make_sharded_train_step
            init_fn, train_step = make_sharded_train_step(env, config, mesh)
            return init_fn, train_step      # jit'd inside
        init_fn, train_step = make_train(env, config)
        return init_fn, jax.jit(train_step)

    # curriculum: stage s of N trains at walk_target * (s+1)/N, reusing
    # the params/optimizer state across stages (the standing skill
    # bootstraps the gait; only the vcm reward term changes)
    n_stages = max(args.curriculum_stages, 0)
    def target_for(i):
        if n_stages <= 0 or args.walk_target == 0.0:
            return args.walk_target
        stage = min(i * n_stages // max(args.iters, 1), n_stages - 1)
        return args.walk_target * (stage + 1) / n_stages

    init_fn, step = make_step(target_for(0))

    ckpt = Checkpointer(args.ckpt_dir)
    tracker = BestModelTracker(ckpt)
    log = StatsLogger(args.csv)

    # sharded init device_puts its own placements — don't wrap it in jit
    ts = (init_fn if mesh is not None
          else jax.jit(init_fn))(jax.random.PRNGKey(0))
    start = 0
    if args.resume and ckpt.latest_step is not None:
        restored = ckpt.restore(template=ts.params)
        ts = ts._replace(params=restored)
        start = ckpt.latest_step
        print(f"resumed params from step {start}")

    t0 = time.time()
    cur_target = target_for(0)
    for i in range(start, start + args.iters):
        t = target_for(i - start)
        if t != cur_target:
            cur_target = t
            _, step = make_step(t)
            # per-stage best: rewards are NOT comparable across stages (a
            # harder target scores lower), so reset the tracker — without
            # this the final stage's policy is never checkpointed and only
            # the easiest stage's 'best' survives
            tracker.best = -float("inf")
            print(f"curriculum: walk target -> {t:.2f} m/s")
        ts, metrics = step(ts)
        sync(metrics["loss"])
        r = float(metrics["reward_per_step"])
        log.log(i, metrics)
        if tracker.update(i, r, ts.params):
            tag = " (new best, checkpointed)"
        else:
            tag = ""
        sps = config.num_envs * config.unroll_length / max(
            (time.time() - t0) / (i - start + 1), 1e-9)
        print(f"iter {i}: reward/step={r:.3f} loss={float(metrics['loss']):.3f} "
              f"done_rate={float(metrics['episode_done_rate']):.3f} "
              f"env-steps/s={sps:,.0f}{tag}")
    # always persist the final params — the curriculum's last stage is the
    # actual task; its policy must survive even if its rewards never beat
    # an earlier stage's (VERDICT r4: a 2000-iter walk run ended with only
    # the stage-1 stander on disk)
    ckpt.save(start + args.iters, ts.params)
    log.flush()
    print(f"log: {args.csv}; best reward/step: {tracker.best:.3f}; "
          f"final params saved at step {start + args.iters}")


if __name__ == "__main__":
    main()
