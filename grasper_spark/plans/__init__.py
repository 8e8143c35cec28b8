"""Query plans: Gremlin-subset AST, predicates, compiler, parser, fluent API."""
