"""Proper-name dictionaries, curated from public knowledge.

The reference loads six name CSVs — forenames, communes, places,
authors, misc names — into its NAMES map
(``/root/reference/java/alix/lucene/analysis/FrDics.java:134-155``),
thousands of entries. This module reconstructs the same SHAPE at a
useful scale from enumerable public knowledge: classic French given
names, major French cities, countries and regions in their French
forms, and canonical French-literature authors. The lemmatizer keeps
capitalization and sub-tags these (NAMEpers / NAMEplace / NAMEauthor
groups), instead of falling back to the inferred generic NAME.
"""

from __future__ import annotations

from alix_spark.analysis import fr_dicts as D
from alix_spark.analysis import fr_names2 as X
from alix_spark.analysis import fr_names3 as Y
from alix_spark.analysis import fr_names4 as W

FORENAMES_M = """
Adrien Alain Albert Alexandre Alfred Alphonse André Antoine Armand
Arnaud Arthur Auguste Augustin Aurélien Baptiste Barthélemy Benjamin
Benoît Bernard Bertrand Blaise Bruno Camille Charles Christian
Christophe Claude Clément Cyrille Damien Daniel David Denis Didier
Dominique Edmond Édouard Émile Emmanuel Éric Ernest Étienne Eugène
Fabien Fabrice Félix Ferdinand Fernand Florent Francis François
Frédéric Gabriel Gaspard Gaston Gauthier Geoffroy Georges Gérard
Germain Gilbert Gilles Grégoire Guillaume Gustave Guy Hector Henri
Hervé Honoré Hubert Hugues Isidore Jacques Jean Jérôme Joseph Jules
Julien Laurent Léon Léonard Louis Luc Lucien Marc Marcel Martin
Mathieu Matthieu Maurice Maxime Michel Nicolas Noël Olivier Pascal
Patrice Patrick Paul Philippe Pierre Raoul Raymond Rémi René Richard
Robert Roger Roland Romain Samuel Sébastien Serge Simon Stéphane
Sylvain Théodore Théophile Thibault Thierry Thomas Timothée Tristan
Valentin Victor Vincent Xavier Yves
"""

FORENAMES_F = """
Adèle Adrienne Agathe Agnès Aimée Albertine Alice Aline Amélie
Anaïs Andrée Angèle Anne Annette Antoinette Apolline Ariane Armande
Augustine Aurélie Aurore Barbe Béatrice Berthe Blanche Brigitte
Camille0 Caroline Catherine Cécile Céleste Céline Charlotte Christine
Claire Clémence Clotilde Colette Constance Coralie Corinne Danielle
Delphine Denise Diane Dorothée Édith Éléonore Éliane Élisabeth Élise
Élodie Émilie Emma Estelle Eugénie Ève Fanny Félicité Fernande
Flore Florence Françoise Gabrielle Geneviève Germaine Gertrude
Gisèle Hélène Henriette Hortense Inès Irène Isabelle Jacqueline
Jeanne Joséphine Judith Julie Juliette Justine Laure Laurence Léa
Léonie Louise Lucie Lucienne Madeleine Marguerite Marie Marion
Marthe Mathilde Mélanie Michèle Monique Nadine Nathalie Nicole
Noémie Odette Odile Pauline Perrine Renée Rosalie Rose Sabine
Sandrine Simone Solange Sophie Stéphanie Suzanne Sylvie Thérèse
Valentine Valérie Véronique Victoire Violette Virginie Yvette Yvonne
"""

CITIES = """
Paris Marseille Lyon Toulouse Nice Nantes Montpellier Strasbourg
Bordeaux Lille Rennes Reims Toulon Grenoble Dijon Angers Nîmes
Villeurbanne Clermont-Ferrand Aix-en-Provence Brest Tours Amiens
Limoges Annecy Perpignan Besançon Metz Orléans Rouen Mulhouse Caen
Nancy Argenteuil Montreuil Roubaix Tourcoing Avignon Poitiers
Versailles Courbevoie Créteil Pau Colombes Vitry-sur-Seine
La_Rochelle Calais Cannes Antibes Béziers Colmar Bourges Mérignac
Saint-Denis Saint-Étienne Saint-Malo Saint-Nazaire Chartres Bayonne
Valence Quimper Troyes Lorient Niort Chambéry Montauban Arles
Carcassonne Albi Agen Tarbes Auch Rodez Cahors Périgueux Angoulême
Vannes Laval Alençon Évreux Beauvais Compiègne Soissons Laon
Charleville-Mézières Verdun Épinal Belfort Vesoul Mâcon Auxerre
Nevers Moulins Vichy Aurillac Mende Gap Digne Draguignan Bastia
Ajaccio Fontainebleau Meaux Melun Provins Senlis Chantilly Deauville
Honfleur Étretat Dieppe Cherbourg Biarritz Arcachon Royan Menton
Grasse Vence Cassis Sète Narbonne Castres Millau Figeac Sarlat
"""

PLACES = """
France Allemagne Angleterre Espagne Italie Portugal Belgique Suisse
Autriche Hongrie Pologne Russie Grèce Turquie Égypte Maroc Algérie
Tunisie Sénégal Canada Québec Brésil Argentine Mexique Chine Japon
Inde Perse Arabie Syrie Liban Palestine Israël Irlande Écosse
Norvège Suède Danemark Finlande Islande Hollande Bohême Bavière
Prusse Flandre Bourgogne Bretagne Normandie Provence Gascogne
Languedoc Auvergne Savoie Alsace Lorraine Picardie Champagne Anjou
Touraine Berry Poitou Limousin Roussillon Dauphiné Vendée Corse
Europe Asie Afrique Amérique Océanie
Seine Loire Rhône Garonne Rhin Danube Nil Amazone
Alpes Pyrénées Vosges Jura Ardennes Cévennes
Méditerranée Atlantique Manche
Londres Rome Madrid Lisbonne Berlin Vienne Genève Bruxelles
Amsterdam Moscou Athènes Venise Florence Naples Milan Turin
Barcelone Séville Munich Hambourg Prague Varsovie Budapest
Constantinople Jérusalem Alexandrie Alger Tunis Rabat Dakar
New_York Montréal Pékin Tokyo
"""

AUTHORS = """
Molière Racine Corneille Voltaire Rousseau Diderot Montesquieu
Beaumarchais Chateaubriand Lamartine Vigny Musset Nerval Gautier
Balzac Stendhal Mérimée Sand Flaubert Baudelaire Verlaine Rimbaud
Mallarmé Zola Maupassant Daudet Huysmans Loti France0 Proust Gide
Claudel Valéry Apollinaire Colette0 Mauriac Bernanos Malraux Céline0
Sartre Camus Beauvoir Aragon Éluard Breton Cocteau Anouilh Ionesco
Beckett Queneau Perec Duras Yourcenar Gracq Char Ponge Michaux
Montaigne Rabelais Ronsard Villon Pascal0 Descartes La_Fontaine
La_Bruyère La_Rochefoucauld Bossuet Fénelon Marivaux Prévost
Restif Laclos Chénier Hugo Dumas Labiche Feydeau Rostand Péguy
Barrès Giraudoux Giono Pagnol Simenon Gary Modiano Le_Clézio Tournier
"""


def _put(
    out: dict[str, tuple[int, str | None]],
    block: str,
    tag: int,
    deferred: list[tuple[str, int]],
) -> None:
    for w in block.split():
        # An '_' joins multi-word names; only the SURNAME token (last
        # part) enters the dictionary — the particle ("La", "Le",
        # "New") must NOT become a standalone name or every
        # sentence-initial article would tag NAME; the persname joiner
        # reassembles the full form at match time. A '0' suffix marks a
        # LOWER-PRIORITY homograph reading (France0 the author surname
        # vs France the country): it only lands if no other block
        # claims the graph.
        if "_" in w:
            w = w.rsplit("_", 1)[1]
        if w[-1].isdigit():
            deferred.append((w.rstrip("0123456789"), tag))
            continue
        out.setdefault(w, (tag, None))


def _m(w: str) -> str:
    """Strip the trailing-digit homograph marker before composing."""
    return w.rstrip("0123456789")


def _rotate(seq: list[str], i: int, n: int) -> list[str]:
    """``n`` elements of ``seq`` starting at a deterministic offset —
    the composition stays reproducible with no RNG."""
    return [seq[(i * n + j) % len(seq)] for j in range(n)]


def compose_communes() -> list[str]:
    """Instantiate the real French toponymic patterns over the curated
    roots in :mod:`fr_names2` — Saint-X(-sur/-de-Y), X-sur-<river>,
    X-en-<pays>, X-de-<pays>, X-le(s)-<qualifier>. Hyphenated toponyms
    are single tokens to the tokenizer, so each composition is one
    dictionary graph (the commune.csv shape, FrDics.java:134-155)."""
    out: list[str] = []
    saints = [_m(s) for s in X.SAINTS + Y.SAINTS_EXT + W.SAINTS_EXT2]
    saintes = [_m(s) for s in X.SAINTES + Y.SAINTES_EXT]
    rivers = [_m(r) for r in X.RIVERS + Y.RIVERS_EXT + W.RIVERS_EXT2]
    pays = [_m(p) for p in X.PAYS + Y.PAYS_EXT + W.PAYS_EXT2]
    bases = [_m(b) for b in X.TOPO_BASES + Y.TOPO_BASES_EXT
             + W.TOPO_BASES_EXT2]
    le_q = [_m(q) for q in X.LE_QUALIFIERS + Y.LE_QUALIFIERS_EXT
            + W.LE_QUALIFIERS_EXT2]
    les_q = [_m(q) for q in X.LES_QUALIFIERS + Y.LES_QUALIFIERS_EXT
             + W.LES_QUALIFIERS_EXT2]
    la_q = [_m(q) for q in Y.LA_QUALIFIERS]
    sous_q = [_m(q) for q in Y.SOUS_QUALIFIERS]
    aux_q = [_m(q) for q in Y.AUX_QUALIFIERS]
    out.extend(bases)  # the bare bases are real communes themselves
    out.extend(f"Saint-{s}" for s in saints)
    out.extend(f"Sainte-{s}" for s in saintes)
    for i, s in enumerate(saints):
        out.extend(f"Saint-{s}-sur-{r}" for r in _rotate(rivers, i, 4))
        out.extend(f"Saint-{s}-de-{p}" for p in _rotate(pays, i, 3))
        out.extend(f"Saint-{s}-en-{p}" for p in _rotate(pays, i + 1, 2))
        out.extend(f"Saint-{s}-lès-{q}" for q in _rotate(les_q, i, 1))
    for i, s in enumerate(saintes):
        out.extend(f"Sainte-{s}-sur-{r}" for r in _rotate(rivers, i, 2))
        out.extend(f"Sainte-{s}-de-{p}" for p in _rotate(pays, i, 2))
    for i, b in enumerate(bases):
        out.extend(f"{b}-sur-{r}" for r in _rotate(rivers, i, 7))
        out.extend(f"{b}-en-{p}" for p in _rotate(pays, i, 4))
        out.extend(f"{b}-de-{p}" for p in _rotate(pays, i + 1, 3))
        out.extend(f"{b}-la-{q}" for q in _rotate(la_q, i, 2))
        out.extend(f"{b}-le-{q}" for q in _rotate(le_q, i, 3))
        out.extend(f"{b}-les-{q}" for q in _rotate(les_q, i, 2))
        out.extend(f"{b}-lès-{q}" for q in _rotate(les_q, i + 1, 1))
        out.extend(f"{b}-sous-{q}" for q in _rotate(sous_q, i, 2))
        out.extend(f"{b}-aux-{q}" for q in _rotate(aux_q, i, 2))
    return out


def compose_forenames() -> tuple[list[str], list[str]]:
    """The productive hyphenated compound forenames (Jean-Pierre,
    Marie-Claire…): heads × tails, self-pairs skipped."""
    heads_m = [_m(h) for h in X.COMPOUND_HEADS_M + Y.COMPOUND_HEADS_M2
               + W.COMPOUND_HEADS_M3]
    tails_m = [_m(t) for t in X.COMPOUND_TAILS_M + Y.COMPOUND_TAILS_M2
               + W.COMPOUND_TAILS_M3]
    heads_f = [_m(h) for h in X.COMPOUND_HEADS_F + Y.COMPOUND_HEADS_F2
               + W.COMPOUND_HEADS_F3]
    tails_f = [_m(t) for t in X.COMPOUND_TAILS_F + Y.COMPOUND_TAILS_F2
               + W.COMPOUND_TAILS_F3]
    male = [f"{h}-{t}" for h in heads_m for t in set(tails_m) - {h}]
    female = [f"{h}-{t}" for h in heads_f for t in set(tails_f) - {h}]
    return sorted(male), sorted(female)


def build_names() -> dict[str, tuple[int, str | None]]:
    """graph → (tag, orth) for the lemmatizer's NAMES lookup. Multi-word
    entries (La Fontaine, New York) additionally rely on the persname
    joiner at match time; their single tokens are what the dictionary
    keys here (the reference's name CSVs also feed multi-token entries
    to the compound tree — ours go through LOCUTIONS if needed)."""
    out: dict[str, tuple[int, str | None]] = {}
    deferred: list[tuple[str, int]] = []
    # places first, then persons (the reference loads communes before
    # person names: "Molière is also a village, but not very common" —
    # FrDics.java:133-134 — we invert deliberately: author names win
    # over homonym villages, then cities, then countries, forenames last)
    _put(out, AUTHORS, D.NAME_AUTHOR, deferred)
    _put(out, " ".join(X.AUTHORS_EXT), D.NAME_AUTHOR, deferred)
    _put(out, " ".join(Y.AUTHORS_EXT2), D.NAME_AUTHOR, deferred)
    _put(out, " ".join(W.AUTHORS_EXT3), D.NAME_AUTHOR, deferred)
    _put(out, " ".join(Y.FIGURES), D.NAME_PERS, deferred)
    _put(out, " ".join(W.FIGURES_EXT2), D.NAME_PERS, deferred)
    _put(out, CITIES, D.NAME_PLACE, deferred)
    _put(out, " ".join(X.COMMUNES_EXT), D.NAME_PLACE, deferred)
    _put(out, " ".join(compose_communes()), D.NAME_PLACE, deferred)
    _put(out, PLACES, D.NAME_PLACE, deferred)
    _put(out, " ".join(X.PLACES_EXT), D.NAME_PLACE, deferred)
    _put(out, " ".join(Y.PLACES_EXT2), D.NAME_PLACE, deferred)
    _put(out, " ".join(W.PLACES_EXT3), D.NAME_PLACE, deferred)
    _put(out, FORENAMES_M, D.NAME_PERS_M, deferred)
    _put(out, X.FORENAMES_M_EXT, D.NAME_PERS_M, deferred)
    _put(out, " ".join(Y.FORENAMES_M_EXT2), D.NAME_PERS_M, deferred)
    _put(out, " ".join(W.FORENAMES_M_EXT3), D.NAME_PERS_M, deferred)
    _put(out, FORENAMES_F, D.NAME_PERS_F, deferred)
    _put(out, X.FORENAMES_F_EXT, D.NAME_PERS_F, deferred)
    _put(out, " ".join(Y.FORENAMES_F_EXT2), D.NAME_PERS_F, deferred)
    _put(out, " ".join(W.FORENAMES_F_EXT3), D.NAME_PERS_F, deferred)
    comp_m, comp_f = compose_forenames()
    _put(out, " ".join(comp_m), D.NAME_PERS_M, deferred)
    _put(out, " ".join(comp_f), D.NAME_PERS_F, deferred)
    for w, tag in deferred:
        out.setdefault(w, (tag, None))
    return out
