class ExpressionError(ValueError):
    """Lex/parse/type error in a user expression."""
