#!/usr/bin/env python3
"""Grammar validation for the Postgres dialect artifacts PostgisLoadJob
emits (VERDICT r16 #3): the emitted CREATE [UNLOGGED] TABLE / CREATE
UNIQUE INDEX / INSERT ... ON CONFLICT / DELETE statements are checked
against a hand-implemented subset of the PUBLISHED PostgreSQL 15 grammar
(doc/src/sgml/ref/{create_table,create_index,insert,delete}.sgml
productions, restricted to exactly the statement shapes the job emits).
The point is that a dialect drift — a type name Postgres does not have,
an unquoted reserved word, a malformed conflict target — fails a spec
here instead of a user's first real load. This is the FALLBACK lane of
`pg_real_check.py`, which executes the same goldens on a real Postgres
when one is available (VERDICT r17 #5).

Usage: pg_grammar_check.py FILE [FILE...]
Each file holds ONE SQL statement (whitespace/newlines free-form).
Exit 0 + "grammar OK (n statements)" when every file parses.
"""
import re
import sys

# PostgreSQL 15 fully-reserved key words (src/include/parser/kwlist.h,
# RESERVED_KEYWORD entries) — an UNQUOTED identifier must not be one.
RESERVED = {
    "all", "analyse", "analyze", "and", "any", "array", "as", "asc",
    "asymmetric", "both", "case", "cast", "check", "collate", "column",
    "constraint", "create", "current_catalog", "current_date",
    "current_role", "current_time", "current_timestamp", "current_user",
    "default", "deferrable", "desc", "distinct", "do", "else", "end",
    "except", "false", "fetch", "for", "foreign", "from", "grant",
    "group", "having", "in", "initially", "intersect", "into", "lateral",
    "leading", "limit", "localtime", "localtimestamp", "not", "null",
    "offset", "on", "only", "or", "order", "placing", "primary",
    "references", "returning", "select", "session_user", "some",
    "symmetric", "system_user", "table", "then", "to", "trailing",
    "true", "union", "unique", "user", "using", "variadic", "when",
    "where", "window", "with",
}

# Type names PostgreSQL 15 actually has, as (head word, parenthesized-arg
# arity range, allowed suffix words). FLOAT8/FLOAT4/INT8 etc. are the
# documented aliases pg_dump itself round-trips.
TYPES = {
    "bigint": (0, 0, ()),
    "int8": (0, 0, ()),
    "integer": (0, 0, ()),
    "int": (0, 0, ()),
    "int4": (0, 0, ()),
    "smallint": (0, 0, ()),
    "int2": (0, 0, ()),
    "text": (0, 0, ()),
    "bytea": (0, 0, ()),
    "float8": (0, 0, ()),
    "float4": (0, 0, ()),
    "real": (0, 0, ()),
    "boolean": (0, 0, ()),
    "bool": (0, 0, ()),
    "date": (0, 0, ()),
    "uuid": (0, 0, ()),
    "numeric": (0, 2, ()),
    "decimal": (0, 2, ()),
    "varchar": (1, 1, ()),
    "char": (1, 1, ()),
    "double": (0, 0, ("precision",)),
    "timestamp": (0, 1, ("with", "time", "zone")),  # suffix checked specially
}

TOKEN = re.compile(r"""
    \s*(
        "(?:[^"]|"")*"            # quoted identifier
      | [A-Za-z_][A-Za-z0-9_$]*   # word / unquoted identifier
      | \d+                       # integer literal
      | \?                        # bind parameter
      | [(),=.;*]                 # punctuation
    )""", re.VERBOSE)


class ParseError(Exception):
    pass


class P:
    def __init__(self, sql):
        self.sql = sql
        self.toks = []
        pos = 0
        while pos < len(sql):
            m = TOKEN.match(sql, pos)
            if not m:
                if sql[pos:].strip() == "":
                    break
                raise ParseError(f"cannot tokenize at: {sql[pos:pos+30]!r}")
            self.toks.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of statement")
        self.i += 1
        return t

    def expect_kw(self, *words):
        for w in words:
            t = self.next()
            if t.lower() != w:
                raise ParseError(f"expected {w.upper()}, got {t!r}")

    def kw_ahead(self, *words):
        return all(
            self.i + k < len(self.toks) and self.toks[self.i + k].lower() == w
            for k, w in enumerate(words))

    def identifier(self, what="identifier"):
        t = self.next()
        if t.startswith('"'):
            if len(t) < 3:
                raise ParseError(f'empty quoted {what}')
            return t
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_$]*", t):
            raise ParseError(f"not a valid {what}: {t!r}")
        if t.lower() in RESERVED:
            raise ParseError(
                f"unquoted {what} {t!r} is a reserved key word in PostgreSQL 15")
        return t

    def type_name(self):
        head = self.next().lower()
        if head not in TYPES:
            raise ParseError(f"not a PostgreSQL 15 type: {head!r}")
        lo, hi, _ = TYPES[head]
        if head == "double":
            self.expect_kw("precision")
            return "double precision"
        nargs = 0
        if self.peek() == "(":
            self.next()
            while True:
                t = self.next()
                if not t.isdigit():
                    raise ParseError(f"type argument must be an integer, got {t!r}")
                nargs += 1
                t = self.next()
                if t == ")":
                    break
                if t != ",":
                    raise ParseError(f"expected , or ) in type args, got {t!r}")
        if head == "timestamp":
            # TIMESTAMP [(p)] [WITH|WITHOUT TIME ZONE]
            if self.kw_ahead("with") or self.kw_ahead("without"):
                self.next()
                self.expect_kw("time", "zone")
            return head
        if not (lo <= nargs <= hi):
            raise ParseError(f"type {head} takes {lo}..{hi} args, got {nargs}")
        return head

    def column_list(self):
        cols = [self.identifier("column name")]
        while self.peek() == ",":
            self.next()
            cols.append(self.identifier("column name"))
        return cols

    # ---- statement productions ------------------------------------
    def create_table(self):
        self.expect_kw("create")
        if self.kw_ahead("unlogged"):
            self.next()  # CREATE UNLOGGED TABLE (the staging-table form)
        self.expect_kw("table")
        if self.kw_ahead("if"):
            self.expect_kw("if", "not", "exists")
        self.identifier("table name")
        if self.next() != "(":
            raise ParseError("expected ( after table name")
        while True:
            self.identifier("column name")
            self.type_name()
            if self.kw_ahead("not"):
                self.expect_kw("not", "null")
            t = self.next()
            if t == ")":
                break
            if t != ",":
                raise ParseError(f"expected , or ) in column list, got {t!r}")
        self.end()

    def insert(self):
        self.expect_kw("insert", "into")
        self.identifier("table name")
        if self.next() != "(":
            raise ParseError("expected ( column list ) after table name")
        cols = self.column_list()
        if self.next() != ")":
            raise ParseError("expected ) closing the column list")
        if self.kw_ahead("values"):
            self.next()
            if self.next() != "(":
                raise ParseError("expected ( after VALUES")
            n = 0
            while True:
                if self.next() != "?":
                    raise ParseError("emitted VALUES rows must be all bind parameters")
                n += 1
                t = self.next()
                if t == ")":
                    break
                if t != ",":
                    raise ParseError("expected , or ) in VALUES row")
            if n != len(cols):
                raise ParseError(
                    f"VALUES arity {n} != column list arity {len(cols)}")
        elif self.kw_ahead("select"):
            self.next()
            sel = self.column_list()
            if [c.lower() for c in sel] != [c.lower() for c in cols]:
                raise ParseError("SELECT list must mirror the INSERT column list")
            self.expect_kw("from")
            self.identifier("staging table name")
        else:
            raise ParseError("expected VALUES or SELECT as the insert source")
        # ON CONFLICT (cols) DO UPDATE SET a = EXCLUDED.a [, ...]
        self.expect_kw("on", "conflict")
        if self.next() != "(":
            raise ParseError("expected ( conflict target )")
        keys = self.column_list()
        if self.next() != ")":
            raise ParseError("expected ) closing the conflict target")
        for k in keys:
            if k.lower() not in [c.lower() for c in cols]:
                raise ParseError(f"conflict-target column {k!r} not in the insert column list")
        self.expect_kw("do", "update", "set")
        while True:
            lhs = self.identifier("assignment column")
            if lhs.lower() in [k.lower() for k in keys]:
                raise ParseError(f"upsert must not reassign key column {lhs!r}")
            if self.next() != "=":
                raise ParseError("expected = in SET assignment")
            self.expect_kw("excluded")
            if self.next() != ".":
                raise ParseError("expected EXCLUDED.<column>")
            rhs = self.identifier("EXCLUDED column")
            if rhs.lower() != lhs.lower():
                raise ParseError(f"assignment {lhs} = EXCLUDED.{rhs} is not the carry-over form")
            if self.peek() != ",":
                break
            self.next()
        self.end()

    def create_unique_index(self):
        # CREATE UNIQUE INDEX [IF NOT EXISTS] name ON table (col [, ...])
        #   [NULLS NOT DISTINCT]
        # — the ON CONFLICT arbiter (create_index.sgml production subset;
        # NULLS NOT DISTINCT is PG15+, required so NULL-keyed rows still
        # collide and a retried staged merge stays exactly-once)
        self.expect_kw("create", "unique", "index")
        if self.kw_ahead("if"):
            self.expect_kw("if", "not", "exists")
        self.identifier("index name")
        self.expect_kw("on")
        self.identifier("table name")
        if self.next() != "(":
            raise ParseError("expected ( column list ) after table name")
        self.column_list()
        if self.next() != ")":
            raise ParseError("expected ) closing the index column list")
        if self.kw_ahead("nulls"):
            self.expect_kw("nulls", "not", "distinct")
        self.end()

    def delete(self):
        self.expect_kw("delete", "from")
        self.identifier("table name")
        self.expect_kw("where")
        self.identifier("column name")
        if self.next() != "=":
            raise ParseError("expected = in DELETE predicate")
        if self.next() != "?":
            raise ParseError("DELETE value must be a bind parameter, never inlined")
        self.end()

    def end(self):
        if self.peek() == ";":
            self.next()
        if self.peek() is not None:
            raise ParseError(f"trailing tokens: {self.toks[self.i:self.i+5]}")

    def statement(self):
        head = (self.toks[0].lower() if self.toks else "")
        if head == "create" and len(self.toks) > 1 and self.toks[1].lower() == "unique":
            self.create_unique_index()
        elif head == "create":
            self.create_table()
        elif head == "insert":
            self.insert()
        elif head == "delete":
            self.delete()
        else:
            raise ParseError(f"unsupported statement head {head!r} "
                             "(checker covers CREATE [UNLOGGED] TABLE / "
                             "CREATE UNIQUE INDEX / INSERT / DELETE)")


def main(paths):
    if not paths:
        print("usage: pg_grammar_check.py FILE [FILE...]", file=sys.stderr)
        return 2
    for path in paths:
        with open(path, encoding="utf-8") as f:
            sql = f.read()
        try:
            P(sql).statement()
        except ParseError as e:
            print(f"FAIL {path}: {e}", file=sys.stderr)
            return 1
    print(f"grammar OK ({len(paths)} statements)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
