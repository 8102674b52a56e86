"""alphazero_tpu.ops — TPU kernels and MXU-friendly primitives."""

from alphazero_tpu.ops.gather import (pick, row_gather, rows_gather,
                                      rows_scatter_add)

__all__ = ["pick", "row_gather", "rows_gather", "rows_scatter_add"]
