"""Pure-numpy kernels + vectorized pandas-UDF wrappers (the engine's 'expressions').

These are the analogue of the reference decoder's per-row transforms
(readosm.c:209-348 varint/zigzag, 1179-1211 delta+scale, 1296-1299 dict resolve)
— vectorized over Arrow batches instead of per-row C callbacks.
"""
