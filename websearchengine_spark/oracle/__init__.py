"""Pure-Python re-implementation of the reference engine's semantics
(no Spark).  Used exclusively by tests as ground truth for rank-identity."""
