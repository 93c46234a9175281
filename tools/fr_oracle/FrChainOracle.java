/*
 * Token-stream parity oracle: runs the REFERENCE's own French analysis
 * chain (compiled from /root/reference/java, resources supplied on the
 * classpath) and dumps the 4-channel token stream as TSV so the Python
 * chain (alix_spark/analysis) can be golden-asserted against it.
 *
 * Chain mirrors FrAnalyzer.createComponents for the default text field
 * (non-search, non-orth): FrTokenizer(XML) -> FrLemFilter ->
 * LocutionFilter -> FrPersnameFilter -> FlagCloudFilter(pun=false)
 * (/root/reference/java/alix/lucene/analysis/FrAnalyzer.java:52-70),
 * plus the _orth twin: ... -> FlagOrthFilter.
 *
 * Usage: java FrChainOracle <indir> <outfile>
 *   indir: directory of UTF-8 .txt documents
 *   out: TSV lines  file TAB chain TAB pos TAB term TAB orth TAB lem
 *        TAB flags TAB start TAB end
 */
import java.io.PrintWriter;
import java.io.StringReader;
import java.nio.charset.StandardCharsets;
import java.nio.file.DirectoryStream;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.Collections;
import java.util.List;

import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.FlagsAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;

import alix.lucene.analysis.FlagCloudFilter;
import alix.lucene.analysis.FlagOrthFilter;
import alix.lucene.analysis.FrLemFilter;
import alix.lucene.analysis.FrPersnameFilter;
import alix.lucene.analysis.FrTokenizer;
import alix.lucene.analysis.LocutionFilter;
import alix.lucene.analysis.tokenattributes.CharsLemAtt;
import alix.lucene.analysis.tokenattributes.CharsOrthAtt;

public class FrChainOracle {

  static void dump(PrintWriter out, String fileId, String chainName, String text) throws Exception {
    Tokenizer source = new FrTokenizer(FrTokenizer.XML);
    TokenStream result = new FrLemFilter(source);
    if (chainName.equals("cloud")) {
      result = new LocutionFilter(result);
      result = new FrPersnameFilter(result);
      result = new FlagCloudFilter(result, false);
    } else { // orth twin field (FrAnalyzer.java:56,67)
      result = new FlagOrthFilter(result);
    }
    CharTermAttribute term = result.addAttribute(CharTermAttribute.class);
    CharsOrthAtt orth = result.addAttribute(CharsOrthAtt.class);
    CharsLemAtt lem = result.addAttribute(CharsLemAtt.class);
    FlagsAttribute flags = result.addAttribute(FlagsAttribute.class);
    OffsetAttribute off = result.addAttribute(OffsetAttribute.class);
    source.setReader(new StringReader(text));
    result.reset();
    int pos = 0;
    while (result.incrementToken()) {
      out.println(fileId + "\t" + chainName + "\t" + pos + "\t" + term.toString()
          + "\t" + orth.toString() + "\t" + lem.toString() + "\t"
          + flags.getFlags() + "\t" + off.startOffset() + "\t" + off.endOffset());
      pos++;
    }
    result.end();
    result.close();
  }

  public static void main(String[] args) throws Exception {
    Path indir = Paths.get(args[0]);
    List<Path> files = new ArrayList<>();
    try (DirectoryStream<Path> ds = Files.newDirectoryStream(indir, "*.txt")) {
      for (Path p : ds) files.add(p);
    }
    Collections.sort(files);
    try (PrintWriter out = new PrintWriter(Files.newBufferedWriter(
        Paths.get(args[1]), StandardCharsets.UTF_8))) {
      for (Path p : files) {
        String text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8);
        String id = p.getFileName().toString().replace(".txt", "");
        dump(out, id, "cloud", text);
        dump(out, id, "orth", text);
      }
    }
  }
}
