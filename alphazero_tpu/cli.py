"""Non-interactive CLI — the reference's four interactive menu modes
(main.py:156-233: train / test / play / train-only) as subcommands.

Usage:
  python -m alphazero_tpu train --preset connect4 --iterations 5 --workdir runs/c4
  python -m alphazero_tpu eval  --preset connect4 --workdir runs/c4 --games 32
  python -m alphazero_tpu play  --preset tictactoe --workdir runs/ttt --human-turn 0
  python -m alphazero_tpu bench --preset connect4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _build(preset_name: str):
    import jax

    from alphazero_tpu.config import preset
    from alphazero_tpu.envs import make_env
    from alphazero_tpu.models import build_model, init_params

    cfg = preset(preset_name)
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    return cfg, env, model


def _parse_mesh(spec: str):
    """'data=8' / 'data=4,model=2' → (n_data, n_model)."""
    n = {"data": None, "model": 1}
    seen = set()
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if k not in n or k in seen or not v.isdigit() or int(v) < 1:
            raise SystemExit(f"bad --mesh spec {spec!r}; "
                             "expected data=N[,model=M] with N,M >= 1")
        seen.add(k)
        n[k] = int(v)
    if n["data"] is None:
        raise SystemExit(f"bad --mesh spec {spec!r}: 'data=N' is required")
    return n["data"], n["model"]


def _apply_overrides(cfg, args):
    tr_over = {}
    if args.games_per_iter:
        tr_over["games_per_iter"] = args.games_per_iter
    if args.selfplay_batch:
        tr_over["selfplay_batch"] = args.selfplay_batch
    if args.batch_size:
        tr_over["batch_size"] = args.batch_size
    if args.gate_games:
        tr_over["gate_games"] = args.gate_games
    if args.no_gate:
        tr_over["gate_enabled"] = False
    if getattr(args, "lr", None) is not None:
        tr_over["learning_rate"] = args.lr
    if tr_over:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **tr_over))
    if args.sims:
        cfg = dataclasses.replace(
            cfg, mcts=dataclasses.replace(cfg.mcts,
                                          num_simulations=args.sims))
    # model-shape overrides (reference train-only mode retypes the net
    # hyperparameters, main.py:221-230 — mode-4 parity without editing
    # presets)
    m_over = {}
    for field in ("family", "width", "blocks", "channels", "embed_dim",
                  "depth", "patch_size"):
        v = getattr(args, f"model_{field}", None)
        if v is not None:
            m_over[field] = v
    if m_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **m_over))
    if args.capacity:
        cfg = dataclasses.replace(
            cfg, replay=dataclasses.replace(cfg.replay,
                                            capacity=args.capacity))
    return cfg


def cmd_train(args):
    import os

    from alphazero_tpu.config import preset
    from alphazero_tpu.training.loop import Trainer
    from alphazero_tpu.utils.metrics import MetricsLogger

    cfg = preset(args.preset)
    cfg = _apply_overrides(cfg, args)
    logger = MetricsLogger(path=f"{args.workdir}/metrics.jsonl"
                           if args.workdir else None)
    if args.mesh:
        # multi-chip path: wire the multi-host runtime (no-op when single
        # process), build the mesh, drive the SPMD programs
        from alphazero_tpu.parallel.distributed import (initialize,
                                                        process_info)
        from alphazero_tpu.parallel.mesh import make_mesh
        from alphazero_tpu.training.spmd_loop import SpmdTrainer

        if initialize(args.coordinator, args.num_processes, args.process_id):
            print(f"multi-host: {process_info()}", file=sys.stderr)
        n_data, n_model = _parse_mesh(args.mesh)
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        tr = SpmdTrainer(
            cfg, mesh=mesh, workdir=args.workdir, logger=logger,
            display=args.display,
            interpret=bool(os.environ.get("AZ_SPMD_INTERPRET")))
        print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)
    else:
        tr = Trainer(cfg, workdir=args.workdir, logger=logger,
                     display=args.display)
    if args.load_buffer:
        n = tr.import_buffer(args.load_buffer, step=args.load_buffer_step)
        print(f"imported {n} buffer rows from {args.load_buffer}",
              file=sys.stderr)
    if args.profile_dir:
        from alphazero_tpu.utils.profiling import trace
        import contextlib
        profile_cm = trace(args.profile_dir)
    else:
        import contextlib
        profile_cm = contextlib.nullcontext()
    if (args.resume or args.train_only) and tr.restore_checkpoint():
        print(f"resumed at version {tr.version}", file=sys.stderr)
    if args.expand_depth:
        tr.expand_depth(args.expand_depth)
        print(f"expanded ViT depth to {args.expand_depth}", file=sys.stderr)
    with profile_cm:
        _run_train(tr, args)


def _run_train(tr, args):
    import sys
    if args.train_only:
        # reference mode 4 (main.py:212-231): SGD on the existing buffer
        # only, no self-play collection
        if int(tr.buffer.size) == 0:
            print("train-only requires a checkpoint with a non-empty "
                  "replay buffer", file=sys.stderr)
            sys.exit(1)
        for _ in range(args.iterations or 1):
            tr.train_epoch()
        tr.params_best = tr.params_new
        tr.save_checkpoint()
        return
    tr.run(args.iterations)


def _run_cfg(cfg, workdir):
    """Rebuild a run's env/model from the config stored beside its
    checkpoints (config.json, written by Trainer) so checkpoints trained
    at any depth/width restore correctly; search/arena settings stay the
    caller's.  Falls back to the caller's config for pre-config runs."""
    import dataclasses as dc

    from alphazero_tpu.config import load_config
    stored = load_config(workdir) if workdir else None
    if stored is None:
        return cfg
    # env/model define the net; replay geometry must match the stored
    # buffer or the Orbax restore shape-checks fail
    return dc.replace(cfg, env=stored.env, model=stored.model,
                      replay=stored.replay)


def cmd_eval(args):
    import jax

    from alphazero_tpu.config import preset
    from alphazero_tpu.eval.arena import Agent, compare
    from alphazero_tpu.models import make_eval_fn
    from alphazero_tpu.training.loop import Trainer

    cfg = _run_cfg(preset(args.preset), args.workdir)
    tr = Trainer(cfg, workdir=args.workdir, persist_config=False)
    if args.workdir and tr.restore_checkpoint(step=args.step):
        print(f"loaded version {tr.version}", file=sys.stderr)
    model_agent = Agent(make_eval_fn(tr.model, tr.params_best), cfg.mcts)
    if args.vs == "vanilla":
        sims = args.vanilla_sims or cfg.mcts.num_simulations
        other = Agent(None, dataclasses.replace(cfg.mcts,
                                                num_simulations=sims))
    elif args.vs == "self":  # best vs contender of the same checkpoint
        other = Agent(make_eval_fn(tr.model, tr.params_new), cfg.mcts)
    else:  # checkpoint: any version vs any version, any workdir — the
        # reference's eval mode loads two independently-configured nets
        # (main.py:181-197 → test.py:106); the opponent's architecture
        # comes from ITS stored config, so heterogeneous models compare
        cfg_b = _run_cfg(cfg, args.workdir_b or args.workdir)
        if cfg_b.env != cfg.env:
            print(f"--vs checkpoint: env mismatch ({cfg_b.env} vs "
                  f"{cfg.env})", file=sys.stderr)
            sys.exit(1)
        trb = Trainer(cfg_b, workdir=args.workdir_b or args.workdir,
                      persist_config=False)
        if not trb.restore_checkpoint(step=args.step_b):
            print("--vs checkpoint: no checkpoint found at "
                  f"{args.workdir_b or args.workdir} step={args.step_b}",
                  file=sys.stderr)
            sys.exit(1)
        print(f"opponent: version {trb.version}", file=sys.stderr)
        other = Agent(make_eval_fn(trb.model, trb.params_best), cfg.mcts)
    rate, score = compare(tr.env, other, model_agent, args.games,
                          jax.random.PRNGKey(args.seed), sampling=True)
    print(json.dumps({"model_win_rate": rate,
                      "score": score.tolist(), "games": args.games}))


def cmd_play(args):
    import jax

    from alphazero_tpu.config import preset
    from alphazero_tpu.eval.play import play_against_agent
    from alphazero_tpu.models import make_eval_fn
    from alphazero_tpu.training.loop import Trainer

    cfg = preset(args.preset)
    eval_fn = None
    env = None
    if args.vanilla:
        from alphazero_tpu.envs import make_env
        env = make_env(cfg.env)
    else:
        cfg = _run_cfg(cfg, args.workdir)
        tr = Trainer(cfg, workdir=args.workdir, persist_config=False)
        if args.workdir:
            tr.restore_checkpoint()
        env = tr.env
        eval_fn = make_eval_fn(tr.model, tr.params_best)
    play_against_agent(env, eval_fn, cfg.mcts, args.human_turn)


def cmd_bench(args):
    import bench
    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="alphazero_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="self-play training loop")
    t.add_argument("--preset", default="connect4")
    t.add_argument("--iterations", type=int, default=None)
    t.add_argument("--games-per-iter", type=int, default=None)
    t.add_argument("--workdir", default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--train-only", action="store_true",
                   help="SGD on the checkpointed buffer, no self-play "
                        "(reference mode 4)")
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run")
    t.add_argument("--display", action="store_true",
                   help="render game 0's board during self-play "
                        "(reference self_play(display=True))")
    t.add_argument("--load-buffer", default=None,
                   help="seed the replay buffer from another run's "
                        "checkpoint workdir (reference buffer preload, "
                        "main.py:129)")
    t.add_argument("--load-buffer-step", type=int, default=None)
    t.add_argument("--expand-depth", type=int, default=None,
                   help="grow the ViT to this many transformer blocks "
                        "before training, transferring matching params "
                        "(reference expand_transformer_layers, "
                        "main.py:99-120); combine with --resume")
    t.add_argument("--mesh", default=None,
                   help="train over a device mesh: data=N[,model=M] — "
                        "game batch / buffer / learner batch shard over "
                        "'data', the ViT tensor-parallels over 'model' "
                        "(training/spmd_loop.py)")
    t.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address for "
                        "jax.distributed.initialize (pod launchers set "
                        "this via env; no-op single-process)")
    t.add_argument("--num-processes", type=int, default=None)
    t.add_argument("--process-id", type=int, default=None)
    t.add_argument("--selfplay-batch", type=int, default=None,
                   help="override the preset's parallel self-play games")
    t.add_argument("--batch-size", type=int, default=None,
                   help="override the preset's SGD batch size")
    t.add_argument("--lr", type=float, default=None,
                   help="override the preset's Adam learning rate "
                        "(reference train-only mode uses 1e-3, "
                        "main.py:230, vs 2.5e-4 for the full loop)")
    t.add_argument("--model-family", dest="model_family", default=None,
                   choices=["vit", "resnet", "dense"],
                   help="override the preset's net family (reference "
                        "mode 4 retypes the net, main.py:221-230)")
    t.add_argument("--model-width", dest="model_width", type=int,
                   default=None, help="dense-family width override")
    t.add_argument("--model-blocks", dest="model_blocks", type=int,
                   default=None, help="dense/resnet blocks override")
    t.add_argument("--model-channels", dest="model_channels", type=int,
                   default=None, help="resnet channels override")
    t.add_argument("--model-embed-dim", dest="model_embed_dim", type=int,
                   default=None, help="vit embed dim override")
    t.add_argument("--model-depth", dest="model_depth", type=int,
                   default=None, help="vit depth override")
    t.add_argument("--model-patch-size", dest="model_patch_size", type=int,
                   default=None, help="vit patch size override")
    t.add_argument("--sims", type=int, default=None,
                   help="override the preset's MCTS simulations per move")
    t.add_argument("--capacity", type=int, default=None,
                   help="override the preset's replay capacity (positions)")
    t.add_argument("--gate-games", type=int, default=None,
                   help="override the preset's gating arena game count")
    t.add_argument("--no-gate", action="store_true",
                   help="disable the promotion gate (reference-stub "
                        "parity, main.py:48-50)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="arena comparison")
    e.add_argument("--preset", default="connect4")
    e.add_argument("--workdir", default=None)
    e.add_argument("--games", type=int, default=32)
    e.add_argument("--vs", choices=["vanilla", "self", "checkpoint"],
                   default="vanilla")
    e.add_argument("--vanilla-sims", type=int, default=None)
    e.add_argument("--step", type=int, default=None,
                   help="checkpoint version for the primary agent "
                        "(default: latest)")
    e.add_argument("--workdir-b", default=None,
                   help="--vs checkpoint: opponent's workdir "
                        "(default: same as --workdir)")
    e.add_argument("--step-b", type=int, default=None,
                   help="--vs checkpoint: opponent's version "
                        "(default: latest)")
    e.add_argument("--seed", type=int, default=0)
    e.set_defaults(fn=cmd_eval)

    g = sub.add_parser("play", help="human vs agent")
    g.add_argument("--preset", default="tictactoe")
    g.add_argument("--workdir", default=None)
    g.add_argument("--human-turn", type=int, default=0, choices=[0, 1])
    g.add_argument("--vanilla", action="store_true",
                   help="play the model-free rollout agent")
    g.set_defaults(fn=cmd_play)

    b = sub.add_parser("bench", help="headline throughput benchmark")
    b.add_argument("--preset", default="connect4")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    from alphazero_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
