// Golden generator for K3 French collation parity: sorts stdin words
// (UTF-8, one per line) with the exact collator the reference uses —
// java.text.Collator FRANCE, TERTIARY strength, canonical decomposition
// (/root/reference/java/alix/lucene/search/FormEnum.java:363-388) —
// and prints them in collated order.
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.text.Collator;
import java.util.ArrayList;
import java.util.List;
import java.util.Locale;

public class FrCollatorOracle {
    public static void main(String[] args) throws Exception {
        Collator c = Collator.getInstance(Locale.FRANCE);
        c.setStrength(Collator.TERTIARY);
        c.setDecomposition(Collator.CANONICAL_DECOMPOSITION);
        List<String> words = new ArrayList<>();
        BufferedReader r = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        String line;
        while ((line = r.readLine()) != null) {
            if (!line.isEmpty()) words.add(line);
        }
        words.sort(c);
        StringBuilder sb = new StringBuilder();
        for (String w : words) sb.append(w).append('\n');
        System.out.write(sb.toString().getBytes(StandardCharsets.UTF_8));
        System.out.flush();
    }
}
