"""Pure-Python semantic kernel (no Spark imports).

Every function here is deterministic and side-effect free so the same code
runs identically on the driver (unit tests) and inside Arrow-batched pandas
UDFs on executors. Semantics mirror the reference implementation
(/root/reference/app/saia.py, /root/reference/app/utils.py); each module
cites the exact file:line it reproduces.
"""
