from omnifusion_tpu.ops.sparse_blend import gather_blend

__all__ = ["gather_blend"]
