"""alphazero_tpu.ops"""
