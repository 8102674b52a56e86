"""CLI + human-play smoke tests (reference modes 3/4, test.py:9-58)."""

import json
import subprocess
import sys

import jax
import numpy as np

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.eval.play import agent_move, parse_input, play_against_agent


def test_parse_input_cell_and_column():
    env = make_env("tictactoe")
    state = env.init()
    assert parse_input(env, state, "1 1") == 4
    assert parse_input(env, state, "bogus") is None
    assert parse_input(env, state, "5 5") is None

    c4 = make_env("connect4")
    s4 = c4.init()
    assert parse_input(c4, s4, "3") == 3
    assert parse_input(c4, s4, "9") is None


def test_play_against_agent_scripted():
    """Scripted human vs vanilla agent completes a legal game."""
    env = make_env("tictactoe")
    moves = iter(["0 0", "0 1", "1 0", "9 9", "2 2", "1 1", "0 2", "2 0",
                  "2 1", "1 2"])
    outputs = []
    w = play_against_agent(
        env, None, MCTSConfig(num_simulations=16), human_turn=0,
        input_fn=lambda _: next(moves), print_fn=outputs.append,
    )
    assert w in (-1, 0, 1)
    assert any("wins" in str(o) or "draw" in str(o) for o in outputs)


def test_agent_move_is_legal():
    env = make_env("connect4")
    state = env.init()
    a = agent_move(env, None, state, jax.random.PRNGKey(0),
                   MCTSConfig(num_simulations=16, use_dirichlet=False),
                   verbose=False)
    assert 0 <= a < 7


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "alphazero_tpu", "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0
    for cmd in ("train", "eval", "play", "bench"):
        assert cmd in out.stdout
