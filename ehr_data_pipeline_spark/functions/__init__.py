"""Native column-expression function library — zero Python UDFs, so every
plan stays inside whole-stage codegen and predicate pushdown."""
