"""alphazero_tpu.utils"""
