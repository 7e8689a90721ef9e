"""cunvsm-extract-reuters: Reuters-21578 SGML -> TRECTEXT + topic classes
(py/extract_reuters.py rebuild).

Parses the SGML distribution, writes a TRECTEXT file of title/dateline/body
text per article, and a document-classification file mapping each article to
its most specific topic among the top-K most frequent topics.

Usage:
    python -m cunvsm_tpu.cli.extract_reuters *.sgm \
        --trectext_out_prefix out --document_classification_out classes.txt
"""

from __future__ import annotations

import argparse
import collections
import html.parser
import logging
import sys


class ReutersParser(html.parser.HTMLParser):
    """Collects per-article texts (title/dateline/body) and category tags
    (topics/places/...) from the Reuters-21578 SGML markup."""

    TEXT_TAGS = {"title", "dateline", "body"}
    CATEGORY_TAGS = {"topics", "places", "companies", "orgs", "exchanges"}

    def __init__(self):
        super().__init__()
        self.documents = []
        self._text_tag = None
        self._category_tag = None

    def handle_starttag(self, tag, attrs):
        if tag == "reuters":
            self.documents.append(
                {
                    "doc_id": str(len(self.documents)),
                    "texts": {},
                    "tags": collections.defaultdict(set),
                }
            )
        elif tag in self.TEXT_TAGS:
            self._text_tag = tag
        elif tag in self.CATEGORY_TAGS:
            self._category_tag = tag

    def handle_endtag(self, tag):
        if tag == self._text_tag:
            self._text_tag = None
        if tag == self._category_tag:
            self._category_tag = None

    def handle_data(self, data):
        if self._text_tag is not None and self.documents:
            self.documents[-1]["texts"][self._text_tag] = data
        if self._category_tag is not None and self.documents:
            self.documents[-1]["tags"][self._category_tag].add(data)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--loglevel", default="INFO")
    p.add_argument("--shard_size", type=int, default=1000000)
    p.add_argument("sgm", nargs="+")
    p.add_argument("--top_k_topics", type=int, default=20)
    p.add_argument("--trectext_out_prefix", required=True)
    p.add_argument("--document_classification_out", required=True)
    args = p.parse_args(argv)
    logging.basicConfig(level=args.loglevel)

    parser = ReutersParser()
    for path in args.sgm:
        logging.info("Parsing %s.", path)
        with open(path, encoding="ISO-8859-1") as f:
            parser.feed(f.read())
    logging.info("Parsed %d documents.", len(parser.documents))

    topic_histogram = collections.Counter(
        topic
        for document in parser.documents
        for topic in document["tags"]["topics"]
    )
    top_topics = set(
        sorted(topic_histogram, key=lambda t: topic_histogram[t])[
            -args.top_k_topics :
        ]
    )
    logging.info("Top topics: %s", sorted(top_topics))

    shard_idx = 0
    docs_in_shard = 0
    f_shard = open(
        f"{args.trectext_out_prefix}_{shard_idx}.trectext",
        "w",
        encoding="latin1",
        errors="replace",
    )
    with open(args.document_classification_out, "w") as f_classes:
        for document in parser.documents:
            doc_id = document["doc_id"]
            doc_text = "\n".join(
                document["texts"].get(k, "")
                for k in ("title", "dateline", "body")
            )
            if docs_in_shard >= args.shard_size:
                f_shard.close()
                shard_idx += 1
                docs_in_shard = 0
                f_shard = open(
                    f"{args.trectext_out_prefix}_{shard_idx}.trectext",
                    "w",
                    encoding="latin1",
                    errors="replace",
                )
            f_shard.write(
                f"<DOC>\n<DOCNO>{doc_id}</DOCNO>\n<TEXT>\n{doc_text}\n"
                "</TEXT>\n</DOC>\n"
            )
            docs_in_shard += 1

            doc_topics = {
                t for t in document["tags"]["topics"] if t in top_topics
            }
            if doc_topics:
                # The most specific (= least frequent) matching topic.
                most_specific = min(
                    doc_topics, key=lambda t: topic_histogram[t]
                )
                f_classes.write(f"{doc_id} {most_specific}\n")
    f_shard.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
