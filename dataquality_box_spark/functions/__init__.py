"""Column-expression and pandas-UDF function library."""
