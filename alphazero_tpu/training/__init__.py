"""alphazero_tpu.training"""
