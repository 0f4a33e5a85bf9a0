"""Recursive-descent parser for the Stan subset
(reference src/exmc_stan_parser.yrl grammar).

AST shape (reference stan/ast.ex):
    {"data": [decl...], "parameters": [decl...], "model": [stmt...]}
decl  = {"name", "type" ("real"|"int"|"vector"|"simplex"),
         "size" (int|str|None), "lower", "upper"}
stmt  = {"target": str, "dist": str, "args": [number|str...], "line": int}
"""

from exmc_tpu.stan.lexer import StanSyntaxError, tokenize


class Parser:
    def __init__(self, tokens, source_lines=None):
        self.tokens = tokens
        self.pos = 0
        self.source_lines = source_lines or []

    def peek(self):
        return self.tokens[self.pos]

    def next(self):
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def error(self, msg, line=None):
        if line is None:
            line = self.peek()[2]
        src = (
            self.source_lines[line - 1]
            if 0 < line <= len(self.source_lines)
            else None
        )
        raise StanSyntaxError(msg, line=line, source_line=src)

    def expect(self, kind):
        tok = self.next()
        if tok[0] != kind:
            self.error(f"expected {kind}, got {tok[1]!r}", line=tok[2])
        return tok

    def parse_program(self):
        ast = {"data": [], "parameters": [], "model": []}
        while self.peek()[0] != "EOF":
            kind, _, line = self.peek()
            if kind == "DATA":
                self.next()
                ast["data"] = self.parse_decl_block()
            elif kind == "PARAMETERS":
                self.next()
                ast["parameters"] = self.parse_decl_block()
            elif kind == "MODEL":
                self.next()
                ast["model"] = self.parse_model_block()
            else:
                self.error(f"expected a block keyword, got {self.peek()[1]!r}")
        return ast

    def parse_decl_block(self):
        self.expect("LBRACE")
        decls = []
        while self.peek()[0] != "RBRACE":
            decls.append(self.parse_decl())
        self.expect("RBRACE")
        return decls

    def parse_decl(self):
        kind, text, line = self.next()
        if kind not in ("REAL", "INT", "VECTOR", "SIMPLEX"):
            self.error(f"expected a type, got {text!r}", line=line)
        decl = {"type": text, "size": None, "lower": None, "upper": None,
                "line": line}
        if kind in ("VECTOR", "SIMPLEX"):
            self.expect("LBRACKET")
            tok = self.next()
            if tok[0] == "NUMBER":
                decl["size"] = int(tok[1])
            elif tok[0] == "IDENT":
                decl["size"] = tok[1]
            else:
                self.error("expected a size", line=tok[2])
            self.expect("RBRACKET")
        if self.peek()[0] == "LANGLE":
            self.next()
            while True:
                bound_tok = self.next()
                if bound_tok[0] not in ("LOWER", "UPPER"):
                    self.error("expected lower/upper", line=bound_tok[2])
                self.expect("EQUALS")
                neg = False
                if self.peek()[0] == "MINUS":
                    self.next()
                    neg = True
                num = self.expect("NUMBER")
                decl[bound_tok[1]] = -float(num[1]) if neg else float(num[1])
                if self.peek()[0] == "COMMA":
                    self.next()
                    continue
                break
            self.expect("RANGLE")
        name = self.expect("IDENT")
        decl["name"] = name[1]
        self.expect("SEMI")
        return decl

    def parse_model_block(self):
        self.expect("LBRACE")
        stmts = []
        while self.peek()[0] != "RBRACE":
            stmts.append(self.parse_sampling_stmt())
        self.expect("RBRACE")
        return stmts

    def parse_sampling_stmt(self):
        target = self.expect("IDENT")
        self.expect("TILDE")
        dist = self.expect("IDENT")
        self.expect("LPAREN")
        args = []
        if self.peek()[0] != "RPAREN":
            while True:
                args.append(self.parse_expr())
                if self.peek()[0] == "COMMA":
                    self.next()
                    continue
                break
        self.expect("RPAREN")
        self.expect("SEMI")
        return {
            "target": target[1],
            "dist": dist[1],
            "args": args,
            "line": target[2],
        }

    # -- expression grammar (EXTENSION beyond the reference, whose
    # frontend rejects arithmetic in dist args — stan.ex:31-36) --
    # expr   := term (('+'|'-') term)*
    # term   := factor (('*'|'/') factor)*
    # factor := NUMBER | IDENT | IDENT '(' expr ')' | '(' expr ')'
    #           | '-' factor
    # AST: number | str (variable) | ("binop", op, l, r)
    #      | ("call", fn, arg) | ("neg", x)

    def parse_expr(self):
        left = self.parse_term()
        while self.peek()[0] in ("PLUS", "MINUS"):
            op = self.next()[0]
            right = self.parse_term()
            left = ("binop", "add" if op == "PLUS" else "sub", left, right)
        return self._fold(left)

    def parse_term(self):
        left = self.parse_factor()
        while self.peek()[0] in ("STAR", "SLASH"):
            op = self.next()[0]
            right = self.parse_factor()
            left = ("binop", "mul" if op == "STAR" else "div", left, right)
        return left

    def parse_factor(self):
        tok = self.next()
        if tok[0] == "NUMBER":
            return tok[1]
        if tok[0] == "MINUS":
            inner = self.parse_factor()
            if isinstance(inner, float):
                return -inner
            return ("neg", inner)
        if tok[0] == "IDENT":
            if self.peek()[0] == "LPAREN":
                self.next()
                arg = self.parse_expr()
                self.expect("RPAREN")
                return ("call", tok[1], arg)
            return tok[1]
        if tok[0] == "LPAREN":
            inner = self.parse_expr()
            self.expect("RPAREN")
            return inner
        self.error(f"expected an expression, got {tok[1]!r}", line=tok[2])

    @staticmethod
    def _fold(node):
        """Constant-fold pure-number subtrees."""
        if not isinstance(node, tuple):
            return node
        if node[0] == "binop":
            l, r = Parser._fold(node[2]), Parser._fold(node[3])
            if isinstance(l, float) and isinstance(r, float):
                import operator

                if node[1] == "div" and r == 0.0:
                    # don't fold: defer to runtime float semantics (inf)
                    return (node[0], node[1], l, r)
                ops = {"add": operator.add, "sub": operator.sub,
                       "mul": operator.mul, "div": operator.truediv}
                return ops[node[1]](l, r)
            return (node[0], node[1], l, r)
        if node[0] == "neg":
            x = Parser._fold(node[1])
            return -x if isinstance(x, float) else ("neg", x)
        if node[0] == "call":
            return (node[0], node[1], Parser._fold(node[2]))
        return node


def parse(code: str):
    tokens = tokenize(code)
    return Parser(tokens, code.split("\n")).parse_program()
