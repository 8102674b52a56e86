"""alphazero_tpu — a TPU-native AlphaZero framework.

A ground-up JAX/XLA re-design of the capabilities of the reference
``ehgus8/alpha-zero`` (PyTorch, single-process, object-graph MCTS): vectorized
pure-functional game environments, batched array-based MCTS that evaluates all
leaf positions of all games in one forward pass, a device-resident replay
buffer with symmetry augmentation at write time, and a sharded actor-learner
training loop over a ``jax.sharding.Mesh``.

Layer map (mirrors reference layers, see SURVEY.md §1):
  envs/      — game rules as pure array functions      (ref: games/)
  search/    — batched MCTS on fixed-size node arrays  (ref: ai/mcts.py, ai/node.py)
  models/    — ViT + ResNet policy/value nets (flax)   (ref: ai/nn.py)
  data/      — replay ring buffer + augmentation       (ref: replay_buffer.py, train.py:8-50)
  training/  — self-play actor, SGD learner, outer loop with gating
               (ref: train.py, main.py:16-83)
  eval/      — arena compare/compete, human play       (ref: test.py)
  parallel/  — mesh/sharding helpers, multi-host setup
  utils/     — logging, metrics, checkpoint IO
"""

__version__ = "0.1.0"

from alphazero_tpu import envs, search, models, data, training, parallel

__all__ = ["envs", "search", "models", "data", "training", "parallel", "__version__"]
