from tangent_spark.functions.porter import stem
from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple
from tangent_spark.sources.extract import extract_math, extract_text

# Classic examples from Porter 1980 (the published algorithm paper).
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"),
    ("digitizer", "digit"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


def test_porter_published_examples():
    bad = [(w, stem(w), e) for w, e in PORTER_CASES if stem(w) != e]
    assert not bad, bad


def test_tokenize_simple():
    assert tokenize_simple("Hello, World! 42x") == ["hello", "world", "42x"]
    assert tokenize_simple("") == []
    assert tokenize_simple(None) == []


def test_tokenize_porter():
    assert tokenize_porter("running quickly") == ["run", "quickli"]


def test_extract_text_basic():
    html = (
        "<html><head><title>T &amp; t</title><style>a{}</style>"
        "<script>1<2</script></head><body><h1>Head</h1>"
        "<p>alpha  beta</p><math><mi>x</mi></math><!-- c --></body></html>"
    )
    assert extract_text(html) == "T & t Head alpha beta"
    assert extract_text(html.encode()) == "T & t Head alpha beta"


def test_extract_math_namespace_strip():
    html = b'<body><m:math xmlns:m="x"><m:mi>x</m:mi></m:math><p>t</p></body>'
    blocks = extract_math(html)
    assert len(blocks) == 1
    assert "<mi>x</mi>" in blocks[0]
    assert "m:mi" not in blocks[0]


def test_extract_math_keeps_qvar():
    html = "<math><mws:qvar name=\"x\"/><mi>y</mi></math>"
    blocks = extract_math(html)
    assert len(blocks) == 1
    assert "mws:qvar" in blocks[0]
