"""Core numerical ops: basis/quadrature tables, mesh indexing, residual
evaluation, and block-structured Gauss–Newton assembly (SURVEY.md §2a)."""
