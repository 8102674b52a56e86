"""alphazero_tpu.data"""
