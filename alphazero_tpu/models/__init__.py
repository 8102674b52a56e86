"""alphazero_tpu.models"""
