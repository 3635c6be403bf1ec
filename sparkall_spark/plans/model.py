"""Intermediate representation for the SPARQL fragment.

The reference keeps this state as loose Scala collections extracted by
re-parsing the query per getter (reference: QueryAnalyser.scala:24-189);
here it is a set of frozen dataclasses produced by one parse.

Naming convention (kept from the reference — its de-facto wire format,
reference: Helpers.scala:98 / SparkExecutor.scala:73-80):
a star's internal columns are ``<star>_<predicateLocalName>_<prefixLabel>``
plus the id column ``<star>_ID``.  The *final* projection renames columns
to the bare SPARQL variable names, which keeps oracle SQL trivial.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Triple:
    """One BGP triple ``?subj <pred> ?obj`` (obj may be a class IRI for rdf:type)."""

    subject: str  # variable name without '?'
    predicate: str  # full IRI
    obj: str  # variable name without '?', or full IRI for rdf:type objects
    obj_is_var: bool = True


@dataclass(frozen=True)
class Filter:
    """``FILTER (?var op value)`` — op in {=, !=, <, <=, >, >=, regex}.

    ``regex`` carries the reference semantics of SQL LIKE patterns
    (``%``/``_`` wildcards — reference: SparkExecutor.scala:180-182);
    ``rlike`` is our extension for true regular expressions.
    """

    var: str
    op: str
    value: str | int | float | tuple  # tuple for VALUES/IN lists
    value_is_string: bool = False
    # FILTER (?a op ?b): value is another variable's name; applied
    # post-join when both sides are bound (extension)
    value_is_var: bool = False


@dataclass(frozen=True)
class ExprFilter:
    """``FILTER (<expression>)`` beyond the simple var-op-literal
    grammar (extension): the full plans/exprs.py fragment with a
    boolean top level, evaluated post-join.  Catalyst still pushes the
    predicate into scans after the plan is assembled.

    ``star``: set when the filter came from inside an OPTIONAL block
    and every referenced variable binds to that one optional star — it
    is then applied PRE-join to the star (equivalent to putting the
    predicate in the left join's ON condition, SPARQL left-join
    semantics); post-join application would wrongly drop left rows."""

    expr: object
    raw: str = ""
    star: str | None = None


@dataclass(frozen=True)
class Bind:
    """``BIND(<expr> AS ?alias)`` (extension): a computed column over
    already-bound variables, evaluated after the BGP joins.  ``expr`` is
    the AST from plans/exprs.py; ``raw`` keeps the source text for error
    messages and SQL comments."""

    alias: str
    expr: object
    raw: str = ""


@dataclass(frozen=True)
class OrderKey:
    var: str
    descending: bool = False


@dataclass(frozen=True)
class Aggregation:
    """``(FN(?var) AS ?alias)`` in the SELECT clause.

    fn in sum|min|max|avg|count|sample|group_concat (sample and
    group_concat are extensions; sample is made deterministic as MIN —
    a legal choice under SPARQL's any-value semantics — and
    group_concat sorts its inputs so results are reproducible and
    oracle-comparable)."""

    fn: str
    var: str  # '*' allowed for count
    alias: str
    distinct: bool = False
    separator: str | None = None  # GROUP_CONCAT(...; SEPARATOR="...")


@dataclass(frozen=True)
class TransformSpec:
    """One entry of the inline TRANSFORM clause.

    Syntax (kept from the reference, QueryAnalyser.scala:166-185):
    ``TRANSFORM(?left?right.l.fn1.fn2(arg) && ...)`` — apply the function
    chain to the join between ``?left`` and ``?right``; side ``l`` hits the
    left star's joining attribute, side ``r`` the right star's ID column.
    """

    left_var: str
    right_var: str
    side: str  # 'l' or 'r'
    functions: tuple[str, ...] = ()


@dataclass
class Star:
    """One star-shaped subquery: all triples sharing a subject variable."""

    subject: str
    triples: list[Triple] = field(default_factory=list)
    class_iri: str | None = None  # from an rdf:type triple, if present

    @property
    def predicates(self) -> list[str]:
        """Non-type predicate IRIs of this star."""
        return [t.predicate for t in self.triples if t.obj_is_var]


@dataclass(frozen=True)
class OptionalBlock:
    """One OPTIONAL block as a join-time UNIT.

    SPARQL left-join semantics are per *block*, not per star: when a
    block contains several stars, either the whole block matches (all
    its stars joined) or none of its variables bind.  Execution
    therefore inner-joins the block's stars first, recursively attaches
    child blocks with LEFT JOINs, and finally left-joins the assembled
    block onto the enclosing scope — a per-star left-join chain would
    partially bind a failed block.

    ``subjects`` holds only the NEW stars this block introduces (an
    outer-level block that re-reads a mandatory star's columns adds no
    group).  ``parent`` is the index of the enclosing block in
    ``ParsedQuery.optional_blocks`` (None = attaches to the mandatory
    scope).  ``var_filters`` / ``expr_filters`` are filters referencing
    more than one star of THIS block: they apply after the block's
    internal inner join, before the block attaches (still inside the
    left join, so they cannot drop enclosing rows)."""

    idx: int
    parent: int | None
    subjects: frozenset[str]
    var_filters: tuple = ()
    expr_filters: tuple = ()
    # filters referencing BOTH this block's stars and enclosing-scope
    # stars: SPARQL LeftJoin(Ω1, Ω2, expr) — they become part of the
    # unit's LEFT JOIN ON condition (they decide whether the block
    # matches, never whether the enclosing row survives)
    attach_var_filters: tuple = ()
    attach_expr_filters: tuple = ()


@dataclass
class ParsedQuery:
    """Everything extracted from one SPARQL text."""

    prefixes: dict[str, str]  # label -> IRI
    select_vars: list[str]  # projected plain variables, in order
    distinct: bool
    stars: dict[str, Star]  # subject var -> star
    var_to_star_pred: dict[str, tuple[str, str]]  # objVar -> (star, predIRI)
    filters: list[Filter]
    aggregations: list[Aggregation]
    group_by: list[str]
    order_keys: list[OrderKey]
    limit: int | None
    transforms: list[TransformSpec] = field(default_factory=list)
    optional_stars: set[str] = field(default_factory=set)  # stars joined LEFT OUTER
    # OPTIONAL blocks as join units, parent-before-child (see
    # OptionalBlock); optional_stars stays the flat union for the
    # planner's edge flags and quick membership checks
    optional_blocks: list[OptionalBlock] = field(default_factory=list)
    # extra UNION branches (extension: the reference excluded UNION
    # queries from its evaluation, evaluation/README.md:9); each branch
    # carries its own stars/filters, solution modifiers live on self
    union_branches: list["ParsedQuery"] = field(default_factory=list)
    # True for UNION branch queries: a SELECT var a branch doesn't bind
    # is legal (it unions as null) rather than an unknown-variable error
    partial_binding: bool = False
    # HAVING clauses (extension; grammar: HAVING (FN(?v) op lit) or
    # HAVING (?alias op lit)) — normalized so var is an aggregate alias
    having: list[Filter] = field(default_factory=list)
    # MINUS { ... } groups (extension): solutions compatible with any
    # minus-group solution on the shared variables are removed
    # (anti-join); each entry is a sub-query over its own group pattern
    minus_groups: list["ParsedQuery"] = field(default_factory=list)
    # FILTER EXISTS { ... } groups (extension): keep solutions that have
    # a compatible match (semi-join); FILTER NOT EXISTS parses into
    # minus_groups (anti-join, same compatibility rule for our shapes)
    exists_groups: list["ParsedQuery"] = field(default_factory=list)
    # VALUES ?var { lit ... } -> IN-list filters (op 'in')
    offset: int | None = None
    # BIND(expr AS ?alias) computed columns, evaluated post-join in
    # declaration order (later binds may reference earlier aliases)
    binds: list[Bind] = field(default_factory=list)
    # ASK { ... } (extension): result is one boolean row named `ask` —
    # true iff the pattern has at least one solution
    is_ask: bool = False
    # CONSTRUCT { template } (SPARQL 1.1 §16.2): result is an RDF graph
    # as a (subject, predicate, object) string DataFrame — one output
    # per template triple per solution, rows with unbound template vars
    # dropped, duplicate triples merged (a graph is a set).  Terms are
    # ("var"|"iri"|"lit", value) pairs; select_vars carries the
    # template's variables so the WHERE pipeline is unchanged.
    construct_template: list[tuple] = field(default_factory=list)
    # DESCRIBE ?x [?y ...] (SPARQL 1.1 §16.4): emit every known triple
    # about each resource the WHERE binds to the listed variables —
    # well-defined here because the mapping model closes each entity's
    # predicate set.  Result schema matches CONSTRUCT's (s, p, o).
    describe_vars: list[str] = field(default_factory=list)
    # general expression FILTERs (see ExprFilter), applied post-join
    expr_filters: list[ExprFilter] = field(default_factory=list)
    # SELECT expressions OVER aggregates, e.g. (ROUND(SUM(?x), 2) AS
    # ?y): aggregate calls become internal __aggN aliases, and these
    # Binds compute the declared alias from them after the groupBy
    post_agg_exprs: list[Bind] = field(default_factory=list)
    # { SELECT ... } sub-selects (SPARQL 1.1 §12): each evaluates
    # independently and joins the outer pattern on its shared projected
    # variables; subquery-only output vars surface under their plain
    # names (see column_for_var)
    subqueries: list["ParsedQuery"] = field(default_factory=list)
    # multi-variable VALUES (?a ?b) { (l1 l2) ... }: an inline solution
    # table inner-joined (broadcast — inline data is tiny by
    # definition) on its variables; single-var VALUES stays an IN filter
    values_tables: list[tuple[list[str], list[tuple]]] = field(
        default_factory=list
    )

    def prefix_label(self, iri: str) -> str:
        """Invert the prefix map for column naming (reference: Helpers.scala:25-36).

        Falls back to a deterministic 8-hex digest for unprefixed namespaces.
        """
        ns, _ = split_iri(iri)
        for label, p in self.prefixes.items():
            if p == ns:
                return label
        import hashlib

        return hashlib.md5(ns.encode()).hexdigest()[:8]

    def column_for(self, star: str, pred_iri: str) -> str:
        """Internal column name ``<star>_<local>_<prefixLabel>``."""
        _, local = split_iri(pred_iri)
        return f"{star}_{local}_{self.prefix_label(pred_iri)}"

    def output_vars(self) -> list[str]:
        """Variables this query's RESULT exposes (the subquery join /
        projection surface): group keys + declared aggregate and
        post-agg aliases under aggregation, else the select list."""
        if self.aggregations or self.group_by:
            return (
                [v for v in self.select_vars if v in self.group_by]
                + [
                    a.alias
                    for a in self.aggregations
                    if not a.alias.startswith("__agg")
                ]
                + [pe.alias for pe in self.post_agg_exprs]
            )
        return list(self.select_vars)

    def subquery_vars(self) -> set[str]:
        return {v for sq in self.subqueries for v in sq.output_vars()}

    def column_for_var(self, var: str) -> str:
        """Internal column for an object variable; subject vars map to
        ``<star>_ID``; BIND aliases to ``<alias>__bind``; subquery
        outputs keep their plain variable name."""
        if var in self.stars:
            return f"{var}_ID"
        if var in self.var_to_star_pred:
            return self.column_for(*self.var_to_star_pred[var])
        if any(b.alias == var for b in self.binds):
            return f"{var}__bind"
        for sq in self.subqueries:
            if var in sq.output_vars():
                return var
        raise KeyError(f"unknown variable ?{var}")


def split_iri(iri: str) -> tuple[str, str]:
    """Split an IRI into (namespace, localname) at the last '#' or '/'."""
    for sep in ("#", "/"):
        idx = iri.rfind(sep)
        if idx >= 0:
            return iri[: idx + 1], iri[idx + 1 :]
    return "", iri
