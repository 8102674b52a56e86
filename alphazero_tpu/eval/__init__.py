"""alphazero_tpu.eval"""
