"""alphazero_tpu.parallel"""
