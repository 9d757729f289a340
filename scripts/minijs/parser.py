"""minijs parser: tokens -> AST (plain tuples).

Pratt expression parsing with JS operator precedence; statements cover
the subset the frontend uses. Automatic semicolon insertion is the
pragmatic variant: a statement may end at '}', EOF, or a newline."""

from __future__ import annotations

from scripts.minijs.lexer import tokenize


class ParseError(SyntaxError):
    pass


# binding powers (higher binds tighter)
BINOPS = {
    "**": 14,
    "*": 13, "/": 13, "%": 13,
    "+": 12, "-": 12,
    "<<": 11, ">>": 11,
    "<": 10, ">": 10, "<=": 10, ">=": 10, "instanceof": 10, "in": 10,
    "==": 9, "!=": 9, "===": 9, "!==": 9,
    "&": 8, "^": 7, "|": 6,
}
LOGICAL = {"&&": 5, "||": 4}
ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
              "**=", "&&=", "||=", "<<=", ">>="}


class Parser:
    def __init__(self, src: str, name: str = "<js>"):
        self.toks = tokenize(src)
        self.pos = 0
        self.name = name

    # ---- token helpers ----------------------------------------------
    def peek(self, k=0):
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at(self, kind, value=None):
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def at_punct(self, *vals):
        t = self.peek()
        return t.kind == "punct" and t.value in vals

    def at_kw(self, *vals):
        t = self.peek()
        return t.kind == "kw" and t.value in vals

    def expect(self, kind, value=None):
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(
                f"{self.name}:L{t.line}: expected "
                f"{value or kind}, got {t.kind} {t.value!r}")
        return t

    def eat_punct(self, value):
        if self.at_punct(value):
            self.next()
            return True
        return False

    def semi(self):
        if self.eat_punct(";"):
            return
        t = self.peek()
        if t.kind == "eof" or (t.kind == "punct" and t.value == "}") or \
                t.nl_before:
            return
        raise ParseError(
            f"{self.name}:L{t.line}: expected ';' before {t.value!r}")

    # ---- program ------------------------------------------------------
    def parse_program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("block", stmts)

    # ---- statements ----------------------------------------------------
    def statement(self):
        t = self.peek()
        if t.kind == "punct":
            if t.value == "{":
                return self.block()
            if t.value == ";":
                self.next()
                return ("empty",)
        if t.kind == "kw":
            v = t.value
            if v in ("var", "let", "const"):
                return self.var_decl()
            if v == "function":
                return self.function(is_async=False, as_decl=True)
            if v == "async" and self.peek(1).kind == "kw" and \
                    self.peek(1).value == "function":
                self.next()
                return self.function(is_async=True, as_decl=True)
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                return self.while_stmt()
            if v == "do":
                return self.do_stmt()
            if v == "return":
                self.next()
                if self.at_punct(";", "}") or self.peek().nl_before or \
                        self.at("eof"):
                    self.semi()
                    return ("return", None)
                e = self.expression()
                self.semi()
                return ("return", e)
            if v == "break":
                self.next()
                self.semi()
                return ("break",)
            if v == "continue":
                self.next()
                self.semi()
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
            if v == "switch":
                return self.switch_stmt()
        if t.kind == "str" and t.value == "use strict":
            self.next()
            self.semi()
            return ("empty",)
        e = self.expression()
        self.semi()
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.at_punct("}"):
            stmts.append(self.statement())
        self.expect("punct", "}")
        return ("block", stmts)

    def var_decl(self, no_semi=False):
        kind = self.next().value
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.eat_punct("="):
                init = self.assignment()
            decls.append((target, init))
            if not self.eat_punct(","):
                break
        if not no_semi:
            self.semi()
        return ("decl", kind, decls)

    def binding_target(self):
        if self.at_punct("{"):
            return self.obj_pattern()
        if self.at_punct("["):
            return self.arr_pattern()
        return ("id", self.expect("id").value)

    def obj_pattern(self):
        self.expect("punct", "{")
        props, rest = [], None
        while not self.at_punct("}"):
            if self.eat_punct("..."):
                rest = self.expect("id").value
            else:
                key = self.next()
                if key.kind not in ("id", "str", "kw"):
                    raise ParseError(f"bad pattern key {key!r}")
                name = key.value
                target = ("id", name)
                if self.eat_punct(":"):
                    target = self.binding_target()
                default = self.assignment() if self.eat_punct("=") else None
                props.append((name, target, default))
            if not self.eat_punct(","):
                break
        self.expect("punct", "}")
        return ("objpat", props, rest)

    def arr_pattern(self):
        self.expect("punct", "[")
        elems, rest = [], None
        while not self.at_punct("]"):
            if self.eat_punct(","):
                elems.append(None)
                continue
            if self.eat_punct("..."):
                rest = self.expect("id").value
            else:
                target = self.binding_target()
                default = self.assignment() if self.eat_punct("=") else None
                elems.append((target, default))
            if not self.eat_punct(","):
                break
        self.expect("punct", "]")
        return ("arrpat", elems, rest)

    def if_stmt(self):
        self.expect("kw", "if")
        self.expect("punct", "(")
        test = self.expression()
        self.expect("punct", ")")
        cons = self.statement()
        alt = None
        if self.at_kw("else"):
            self.next()
            alt = self.statement()
        return ("if", test, cons, alt)

    def for_stmt(self):
        self.expect("kw", "for")
        self.expect("punct", "(")
        init = None
        if not self.at_punct(";"):
            if self.at_kw("var", "let", "const"):
                kind = self.peek().value
                save = self.pos
                self.next()
                target = self.binding_target()
                if self.at_kw("of", "in"):
                    which = self.next().value
                    iterable = self.expression()
                    self.expect("punct", ")")
                    body = self.statement()
                    return ("forof" if which == "of" else "forin",
                            kind, target, iterable, body)
                self.pos = save
                init = self.var_decl(no_semi=True)
            else:
                init = ("expr", self.expression())
        self.expect("punct", ";")
        test = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        update = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        body = self.statement()
        return ("for", init, test, update, body)

    def while_stmt(self):
        self.expect("kw", "while")
        self.expect("punct", "(")
        test = self.expression()
        self.expect("punct", ")")
        return ("while", test, self.statement())

    def do_stmt(self):
        self.expect("kw", "do")
        body = self.statement()
        self.expect("kw", "while")
        self.expect("punct", "(")
        test = self.expression()
        self.expect("punct", ")")
        self.semi()
        return ("dowhile", test, body)

    def try_stmt(self):
        self.expect("kw", "try")
        block = self.block()
        param = catch = final = None
        if self.at_kw("catch"):
            self.next()
            if self.eat_punct("("):
                param = self.binding_target()
                self.expect("punct", ")")
            catch = self.block()
        if self.at_kw("finally"):
            self.next()
            final = self.block()
        return ("try", block, param, catch, final)

    def switch_stmt(self):
        self.expect("kw", "switch")
        self.expect("punct", "(")
        disc = self.expression()
        self.expect("punct", ")")
        self.expect("punct", "{")
        cases = []   # (testExpr|None, [stmts])
        while not self.at_punct("}"):
            if self.at_kw("case"):
                self.next()
                test = self.expression()
            else:
                self.expect("kw", "default")
                test = None
            self.expect("punct", ":")
            stmts = []
            while not (self.at_punct("}") or self.at_kw("case", "default")):
                stmts.append(self.statement())
            cases.append((test, stmts))
        self.expect("punct", "}")
        return ("switch", disc, cases)

    # ---- functions -----------------------------------------------------
    def function(self, is_async, as_decl):
        self.expect("kw", "function")
        name = None
        if self.at("id"):
            name = self.next().value
        params = self.param_list()
        body = self.block()
        node = ("fn", name, params, body, is_async, False)
        if as_decl and name:
            return ("fn_decl", name, node)
        return node if not as_decl else ("expr", node)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            if self.eat_punct("..."):
                params.append(("rest", self.expect("id").value))
            else:
                target = self.binding_target()
                default = self.assignment() if self.eat_punct("=") else None
                params.append(("param", target, default))
            if not self.eat_punct(","):
                break
        self.expect("punct", ")")
        return params

    def _arrow_ahead(self):
        """At '(': is this an arrow-function parameter list?"""
        assert self.at_punct("(")
        depth = 0
        k = 0
        while True:
            t = self.peek(k)
            if t.kind == "eof":
                return False
            if t.kind == "punct":
                if t.value in "([{":
                    depth += 1
                elif t.value in ")]}":
                    depth -= 1
                    if depth == 0:
                        nxt = self.peek(k + 1)
                        return nxt.kind == "punct" and nxt.value == "=>"
            k += 1

    def arrow_function(self, is_async):
        if self.at_punct("("):
            params = self.param_list()
        else:
            params = [("param", ("id", self.expect("id").value), None)]
        self.expect("punct", "=>")
        if self.at_punct("{"):
            body = self.block()
        else:
            body = ("return", self.assignment())
        return ("fn", None, params, body, is_async, True)

    # ---- expressions ----------------------------------------------------
    def expression(self):
        e = self.assignment()
        if self.at_punct(","):
            exprs = [e]
            while self.eat_punct(","):
                exprs.append(self.assignment())
            return ("seq", exprs)
        return e

    def assignment(self):
        # arrow lookahead
        if self.at_punct("(") and self._arrow_ahead():
            return self.arrow_function(False)
        if self.at("id") and self.peek(1).kind == "punct" and \
                self.peek(1).value == "=>":
            return self.arrow_function(False)
        if self.at_kw("async"):
            nxt = self.peek(1)
            if nxt.kind == "id" and self.peek(2).kind == "punct" and \
                    self.peek(2).value == "=>":
                self.next()
                return self.arrow_function(True)
            if nxt.kind == "punct" and nxt.value == "(":
                save = self.pos
                self.next()
                if self.at_punct("(") and self._arrow_ahead():
                    return self.arrow_function(True)
                self.pos = save

        left = self.conditional()
        if self.at("punct") and self.peek().value in ASSIGN_OPS:
            op = self.next().value
            right = self.assignment()
            return ("assign", op, self._to_target(left), right)
        return left

    def _to_target(self, node):
        """Re-interpret an expression as an assignment target."""
        if node[0] in ("id", "member", "objpat", "arrpat"):
            return node
        if node[0] == "arr":
            elems = []
            for el in node[1]:
                if el is None:
                    elems.append(None)
                else:
                    elems.append((self._to_target(el), None))
            return ("arrpat", elems, None)
        raise ParseError(f"invalid assignment target {node[0]}")

    def conditional(self):
        test = self.binary(0)
        if self.eat_punct("?"):
            cons = self.assignment()
            self.expect("punct", ":")
            alt = self.assignment()
            return ("cond", test, cons, alt)
        return test

    def binary(self, min_bp):
        left = self.unary()
        while True:
            t = self.peek()
            op = t.value
            if t.kind == "punct" and op in LOGICAL and LOGICAL[op] >= min_bp:
                self.next()
                right = self.binary(LOGICAL[op] + 1)
                left = ("logical", op, left, right)
                continue
            is_binop = (t.kind == "punct" and op in BINOPS) or \
                (t.kind == "kw" and op in ("instanceof", "in"))
            if is_binop and BINOPS[op] >= min_bp:
                self.next()
                right = self.binary(BINOPS[op] + 1)
                left = ("binop", op, left, right)
                continue
            return left

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.kind == "kw" and t.value in ("typeof", "delete", "void"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.kind == "kw" and t.value == "await":
            self.next()
            return ("await", self.unary())
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, self._to_target(self.unary()), True)
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--") and \
                not t.nl_before:
            self.next()
            return ("update", t.value, self._to_target(e), False)
        return e

    def call_member(self, allow_call=True):
        if self.at_kw("new"):
            self.next()
            callee = self.call_member(allow_call=False)
            args = self.arguments() if self.at_punct("(") else []
            e = ("new", callee, args)
        else:
            e = self.primary()
        while True:
            if self.eat_punct("."):
                t = self.next()
                if t.kind not in ("id", "kw"):
                    raise ParseError(
                        f"{self.name}:L{t.line}: bad property {t.value!r}")
                e = ("member", e, ("str", t.value), False)
            elif self.at_punct("["):
                self.next()
                prop = self.expression()
                self.expect("punct", "]")
                e = ("member", e, prop, True)
            elif allow_call and self.at_punct("("):
                e = ("call", e, self.arguments())
            else:
                return e

    def arguments(self):
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            if self.eat_punct("..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.eat_punct(","):
                break
        self.expect("punct", ")")
        return args

    def primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return ("num", t.value)
        if t.kind == "str":
            self.next()
            return ("str", t.value)
        if t.kind == "regex":
            self.next()
            return ("regex", t.value[0], t.value[1])
        if t.kind == "template":
            self.next()
            strings, expr_srcs = t.value
            exprs = [Parser(src, self.name).expression()
                     for src in expr_srcs]
            return ("tpl", strings, exprs)
        if t.kind == "id":
            self.next()
            return ("id", t.value)
        if t.kind == "kw":
            v = t.value
            if v in ("true", "false"):
                self.next()
                return ("bool", v == "true")
            if v == "null":
                self.next()
                return ("null",)
            if v == "undefined":
                self.next()
                return ("undef",)
            if v == "this":
                self.next()
                return ("this",)
            if v == "function":
                return self.function(is_async=False, as_decl=False)
            if v == "async" and self.peek(1).kind == "kw" and \
                    self.peek(1).value == "function":
                self.next()
                return self.function(is_async=True, as_decl=False)
        if t.kind == "punct":
            if t.value == "(":
                self.next()
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t.value == "[":
                return self.array_literal()
            if t.value == "{":
                return self.object_literal()
        raise ParseError(
            f"{self.name}:L{t.line}: unexpected token {t.value!r}")

    def array_literal(self):
        self.expect("punct", "[")
        elems = []
        while not self.at_punct("]"):
            if self.eat_punct(","):
                elems.append(None)
                continue
            if self.eat_punct("..."):
                elems.append(("spread", self.assignment()))
            else:
                elems.append(self.assignment())
            if not self.eat_punct(","):
                break
        self.expect("punct", "]")
        return ("arr", elems)

    def object_literal(self):
        self.expect("punct", "{")
        props = []
        while not self.at_punct("}"):
            if self.eat_punct("..."):
                props.append(("spread", self.assignment()))
            elif self.at_punct("["):
                self.next()
                key = self.expression()
                self.expect("punct", "]")
                self.expect("punct", ":")
                props.append(("prop", key, self.assignment(), True))
            else:
                t = self.next()
                if t.kind not in ("id", "str", "kw", "num"):
                    raise ParseError(
                        f"{self.name}:L{t.line}: bad object key {t.value!r}")
                name = (str(int(t.value)) if t.kind == "num"
                        and float(t.value).is_integer()
                        else str(t.value))
                # method shorthand: name(args) { ... }
                if self.at_punct("("):
                    params = self.param_list()
                    body = self.block()
                    props.append(("prop", ("str", name),
                                  ("fn", name, params, body, False, False),
                                  False))
                elif t.value == "async" and t.kind in ("id", "kw") and \
                        (self.at("id") or self.at("kw")):
                    mname = self.next().value
                    params = self.param_list()
                    body = self.block()
                    props.append(("prop", ("str", mname),
                                  ("fn", mname, params, body, True, False),
                                  False))
                elif self.eat_punct(":"):
                    props.append(("prop", ("str", name),
                                  self.assignment(), False))
                else:
                    # shorthand {name}
                    props.append(("prop", ("str", name), ("id", name),
                                  False))
            if not self.eat_punct(","):
                break
        self.expect("punct", "}")
        return ("obj", props)


def parse(src: str, name: str = "<js>"):
    return Parser(src, name).parse_program()
