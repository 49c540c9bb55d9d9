"""Per-language function-word (stopword) lists for the jusText-style
HTML extraction keep rule (r10 VERDICT "Next round" #4).

jusText's public release ships one stopword list per language and
scores block prose-ness by stopword DENSITY in that language; with only
``EN_STOPWORDS`` (functions/text.py — 10 words, frozen into several
oracles), non-English pages survived extraction only via the
long-block escape hatch, which also keeps long navigation chrome.

These are compact core lists (~40-60 entries) of each language's most
common function words — articles, prepositions, pronouns, conjunctions,
auxiliaries — standard public linguistic knowledge (the same closed-class
vocabulary any frequency list of the language leads with). A block of
real prose in language L hits ~20-50% of its tokens against L's list;
navigation/boilerplate hits ~0% in every language — the jusText
observation these thresholds rely on is language-independent, so a
compact core list separates exactly like a long tail list at the
``min_stop_pct`` operating points this engine uses (5-30%).

All entries are lowercase; accented forms are spelled with their
accents (the extraction chain lowercases tokens before matching, and
Spark/DuckDB agree on Unicode lowercasing for these alphabets).
"""

from __future__ import annotations

__all__ = ["STOPWORDS", "DEFAULT_LANGS"]

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
        "for", "on", "that", "this", "with", "as", "was", "are", "be",
        "by", "at", "from", "but", "not", "they", "his", "her", "she",
        "he", "we", "you", "i", "their", "have", "has", "had", "were",
        "been", "will", "would", "there", "what", "which", "who", "all",
        "its", "if", "can", "do", "about",
    ),
    "de": (
        "der", "die", "das", "und", "oder", "zu", "in", "ist", "es",
        "für", "auf", "dass", "mit", "als", "war", "sind", "sein",
        "von", "bei", "aus", "aber", "nicht", "sie", "er", "wir", "ihr",
        "ich", "haben", "hat", "hatte", "waren", "wird", "würde", "ein",
        "eine", "einen", "dem", "den", "des", "im", "am", "um", "nach",
        "über", "auch", "wenn", "kann", "noch", "nur", "werden",
    ),
    "fr": (
        "le", "la", "les", "un", "une", "des", "de", "du", "et", "ou",
        "à", "en", "est", "il", "elle", "pour", "sur", "que", "qui",
        "ce", "cette", "avec", "comme", "était", "sont", "être", "par",
        "au", "aux", "mais", "pas", "ne", "ils", "elles", "nous",
        "vous", "je", "leur", "avoir", "ont", "avait", "sera", "dans",
        "plus", "se", "son", "sa", "ses", "si", "on",
    ),
    "es": (
        "el", "la", "los", "las", "un", "una", "unos", "unas", "de",
        "del", "y", "o", "a", "en", "es", "está", "para", "por", "que",
        "quien", "este", "esta", "con", "como", "era", "son", "ser",
        "al", "pero", "no", "ellos", "ellas", "nosotros", "yo", "su",
        "sus", "tiene", "tienen", "tenía", "será", "hay", "más", "se",
        "lo", "le", "les", "si", "ya", "muy", "cuando",
    ),
    "it": (
        "il", "lo", "la", "i", "gli", "le", "un", "una", "uno", "di",
        "del", "della", "e", "o", "a", "in", "è", "sono", "per", "su",
        "che", "chi", "questo", "questa", "con", "come", "era", "essere",
        "al", "ma", "non", "loro", "noi", "io", "suo", "sua", "ha",
        "hanno", "aveva", "sarà", "ci", "più", "si", "nel", "alla",
        "da", "se", "anche", "molto", "quando",
    ),
    "pt": (
        "o", "a", "os", "as", "um", "uma", "uns", "umas", "de", "do",
        "da", "dos", "das", "e", "ou", "em", "é", "são", "para", "por",
        "que", "quem", "este", "esta", "com", "como", "era", "ser",
        "ao", "mas", "não", "eles", "elas", "nós", "eu", "seu", "sua",
        "tem", "têm", "tinha", "será", "há", "mais", "se", "no", "na",
        "nos", "nas", "já", "quando",
    ),
    "nl": (
        "de", "het", "een", "en", "of", "te", "in", "is", "dus", "voor",
        "op", "dat", "dit", "met", "als", "was", "zijn", "worden",
        "van", "bij", "uit", "maar", "niet", "zij", "hij", "wij",
        "jullie", "ik", "hun", "hebben", "heeft", "had", "waren",
        "wordt", "zal", "er", "naar", "over", "ook", "aan", "om", "dan",
        "nog", "wel", "kan", "deze", "die", "door", "tot", "je",
    ),
    "sv": (
        "den", "det", "en", "ett", "och", "eller", "att", "i", "är",
        "för", "på", "som", "med", "var", "vara", "av", "vid", "från",
        "men", "inte", "de", "han", "hon", "vi", "ni", "jag", "deras",
        "ha", "har", "hade", "kommer", "skulle", "till", "om", "efter",
        "över", "också", "när", "kan", "bara", "ännu", "blir", "denna",
        "detta", "dessa", "sig", "sin", "sitt", "så", "du",
    ),
    "pl": (
        "i", "w", "z", "na", "do", "że", "się", "nie", "jest", "są",
        "to", "ten", "ta", "te", "dla", "po", "przy", "od", "ale",
        "oni", "one", "my", "wy", "ja", "ich", "ma", "mają", "miał",
        "będzie", "był", "była", "było", "być", "jak", "co", "kto",
        "tak", "czy", "już", "tylko", "może", "przez", "pod", "nad",
        "o", "u", "a", "lub", "oraz", "który",
    ),
    "cs": (
        "a", "v", "z", "na", "do", "že", "se", "ne", "je", "jsou",
        "to", "ten", "ta", "ty", "pro", "po", "při", "od", "ale",
        "oni", "ony", "my", "vy", "já", "jejich", "má", "mají", "měl",
        "bude", "byl", "byla", "bylo", "být", "jak", "co", "kdo",
        "tak", "zda", "už", "jen", "může", "přes", "pod", "nad", "o",
        "u", "i", "nebo", "který", "s",
    ),
    "tr": (
        "ve", "veya", "bir", "bu", "şu", "o", "için", "ile", "de",
        "da", "mi", "mı", "mu", "mü", "ne", "her", "çok", "daha",
        "en", "gibi", "kadar", "sonra", "önce", "ama", "fakat",
        "değil", "var", "yok", "ben", "sen", "biz", "siz", "onlar",
        "onun", "bunun", "şunun", "kendi", "olan", "olarak", "oldu",
        "olur", "ise", "ki", "diye", "içinde", "üzerinde", "arasında",
        "göre", "karşı", "beri",
    ),
    "id": (
        "dan", "atau", "yang", "di", "ke", "dari", "untuk", "dengan",
        "pada", "adalah", "itu", "ini", "sebagai", "oleh", "dalam",
        "tidak", "akan", "sudah", "telah", "bisa", "dapat", "juga",
        "karena", "jika", "ada", "mereka", "kami", "kita", "saya",
        "kamu", "dia", "nya", "tersebut", "satu", "dua", "lebih",
        "sangat", "hanya", "masih", "harus", "ketika", "setelah",
        "sebelum", "antara", "atas", "bawah", "tentang", "seperti",
        "namun", "tetapi",
    ),
}

# detection order = tie-break order: a document whose stopword hits tie
# across languages resolves to the EARLIER entry (en first, the corpus
# majority class in every public crawl)
DEFAULT_LANGS: tuple[str, ...] = (
    "en", "de", "fr", "es", "it", "pt", "nl", "sv", "pl", "cs", "tr",
    "id",
)
