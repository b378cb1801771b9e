"""Column-expression building blocks (all JVM-side / codegen'd — the fast path).

UDFs live only where built-ins genuinely can't express the semantics
(SimHash bit-vote accumulation, multimodal decode) and are always
Arrow-batched pandas UDFs, never row-at-a-time Python.
"""
