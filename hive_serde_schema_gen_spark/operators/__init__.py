"""Layer B operators: the relational/analytics surface of the engine,
all DataFrame/SQL-first so Catalyst + AQE own the physical plan."""
