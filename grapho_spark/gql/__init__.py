"""GQL front-end: lexer, parser, AST for the reference graph DDL/DML
query language (grammar-compatible with /root/reference/parser/)."""

from grapho_spark.gql.lexer import Lexer, Token, TokenType
from grapho_spark.gql.parser import ParseError, Parser, parse_script

__all__ = ["Lexer", "Token", "TokenType", "Parser", "ParseError", "parse_script"]
