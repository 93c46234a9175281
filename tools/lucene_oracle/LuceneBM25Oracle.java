/**
 * Golden-fixture generator: index a TSV corpus (docId \t pretokenized text)
 * with Lucene 8.8.1 (the exact jar the reference ships,
 * /root/reference/lib/lucene-core-8.8.1.jar) and print BM25 top-k results
 * for a query file, one JSON line per query.
 *
 * The corpus text is pre-tokenized by the Python side (alix_spark simple
 * chain) and joined with spaces, so WhitespaceAnalyzer yields identical
 * tokens — the comparison then isolates BM25 scoring + norm quantization.
 *
 * Usage: java LuceneBM25Oracle corpus.tsv queries.txt k
 * Output: {"q": "...", "topk": [[docId, score], ...]}
 */

import java.io.BufferedReader;
import java.io.FileReader;
import java.nio.file.Files;
import java.nio.file.Path;
import org.apache.lucene.analysis.core.WhitespaceAnalyzer;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.StoredField;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.index.Term;
import org.apache.lucene.search.BooleanClause;
import org.apache.lucene.search.BooleanQuery;
import org.apache.lucene.search.IndexSearcher;
import org.apache.lucene.search.Query;
import org.apache.lucene.search.ScoreDoc;
import org.apache.lucene.search.TermQuery;
import org.apache.lucene.search.TopDocs;
import org.apache.lucene.search.similarities.BM25Similarity;
import org.apache.lucene.store.ByteBuffersDirectory;
import org.apache.lucene.store.Directory;

public class LuceneBM25Oracle {
  public static void main(String[] args) throws Exception {
    String corpusPath = args[0];
    String queriesPath = args[1];
    int k = Integer.parseInt(args[2]);

    Directory dir = new ByteBuffersDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new WhitespaceAnalyzer());
    cfg.setSimilarity(new BM25Similarity()); // k1=1.2, b=0.75 defaults
    try (IndexWriter w = new IndexWriter(dir, cfg)) {
      try (BufferedReader r = new BufferedReader(new FileReader(corpusPath))) {
        String line;
        while ((line = r.readLine()) != null) {
          int tab = line.indexOf('\t');
          long docId = Long.parseLong(line.substring(0, tab));
          String text = line.substring(tab + 1);
          Document d = new Document();
          d.add(new StoredField("id", docId));
          d.add(new TextField("text", text, Field.Store.NO));
          w.addDocument(d);
        }
      }
      w.commit();
      w.forceMerge(1);
    }

    try (DirectoryReader reader = DirectoryReader.open(dir)) {
      IndexSearcher searcher = new IndexSearcher(reader);
      searcher.setSimilarity(new BM25Similarity());
      for (String qline : Files.readAllLines(Path.of(queriesPath))) {
        qline = qline.trim();
        if (qline.isEmpty()) continue;
        Query q;
        if (qline.startsWith("\"") && qline.endsWith("\"")) {
          // exact phrase: "w1 w2 ..." -> PhraseQuery (slop 0)
          org.apache.lucene.search.PhraseQuery.Builder pb =
              new org.apache.lucene.search.PhraseQuery.Builder();
          for (String tok : qline.substring(1, qline.length() - 1).split("\\s+")) {
            pb.add(new Term("text", tok));
          }
          q = pb.build();
        } else {
          BooleanQuery.Builder b = new BooleanQuery.Builder();
          for (String tok : qline.split("\\s+")) {
            BooleanClause.Occur occur = BooleanClause.Occur.SHOULD;
            if (tok.startsWith("+")) { occur = BooleanClause.Occur.MUST; tok = tok.substring(1); }
            else if (tok.startsWith("-")) { occur = BooleanClause.Occur.MUST_NOT; tok = tok.substring(1); }
            b.add(new TermQuery(new Term("text", tok)), occur);
          }
          q = b.build();
        }
        TopDocs top = searcher.search(q, k);
        StringBuilder sb = new StringBuilder();
        sb.append("{\"q\": \"").append(qline.replace("\"", "\\\"")).append("\", \"topk\": [");
        boolean first = true;
        for (ScoreDoc sd : top.scoreDocs) {
          long id = reader.document(sd.doc).getField("id").numericValue().longValue();
          if (!first) sb.append(", ");
          first = false;
          sb.append("[").append(id).append(", ").append(sd.score).append("]");
        }
        sb.append("]}");
        System.out.println(sb);
      }
    }
  }
}
