"""Full-size French locution list, built from public-knowledge phraseology.

The reference ships a ~1,490-entry ``locutions.csv`` feeding its
compound trie (``/root/reference/java/alix/lucene/analysis/FrDics.java:163,278-343``,
``LocutionFilter.java``). This module reconstructs a list of the same
scale from the standard phraseological families of French — adverbial
locutions on ``à / en / de / par / sans / sous / sur / tout``,
conjunctive ``... que`` locutions, complex prepositions, verbal idioms
on the support verbs (avoir / faire / prendre / mettre / tenir /
rendre / donner / perdre / porter), and everyday noun compounds.
Everything here is dictionary-grade common French; no external resource
is copied.

Authoring format: one display form per line (written naturally, with
apostrophes), tagged per block. :func:`build_locutions` compiles each
display form into the TOKEN-KEY tuple the LocutionFilter walk produces
at match time — elisions expanded exactly like the tokenizer
(``fr_dicts.ELISION``), verbs keyed by their lemma exactly like
``french._loc_key`` — so an authored form can never silently fail to
match its own token stream.
"""

from __future__ import annotations

from alix_spark.analysis import fr_dicts as D

# --------------------------------------------------------------------- #
# display forms by grammatical category
# --------------------------------------------------------------------- #

ADV = """
à bientôt ; à bon droit ; à bon marché ; à bout ; à bout de bras ;
à bout portant ; à bras ouverts ; à brûle-pourpoint ; à cheval ;
à ciel ouvert ; à contrecœur ; à côté ; à coup sûr ; à couvert ;
à demi ; à dessein ; à deux pas ; à droite ; à découvert ; à défaut ;
à fond ; à gauche ; à genoux ; à grand-peine ; à grands pas ;
à huis clos ; à jamais ; à jeun ; à jour ; à juste titre ; à l'abandon ;
à l'abri ; à l'aise ; à l'amiable ; à l'aube ; à l'aveuglette ;
à l'avance ; à l'écart ; à l'échelle ; à l'endroit ; à l'envers ;
à l'envi ; à l'époque ; à l'étranger ; à l'évidence ; à l'excès ;
à l'extérieur ; à l'heure ; à l'improviste ; à l'instant ;
à l'intérieur ; à l'inverse ; à l'occasion ; à l'œil ; à l'ordinaire ;
à l'origine ; à l'unanimité ; à la baisse ; à la campagne ;
à la dérive ; à la dérobée ; à la fin ; à la fois ; à la hâte ;
à la hausse ; à la légère ; à la lettre ; à la limite ; à la longue ;
à la main ; à la maison ; à la mode ; à la perfection ; à la rigueur ;
à la ronde ; à la suite ; à la va-vite ; à la volée ; à loisir ;
à merveille ; à mi-chemin ; à mi-voix ; à moitié ; à mon avis ;
à nouveau ; à part ; à part entière ; à partir ; à peine ;
à perte de vue ; à peu près ; à pied ; à plat ; à plein temps ;
à pleine voix ; à plusieurs reprises ; à point ; à point nommé ;
à premier abord ; à première vue ; à présent ; à priori ; à propos ;
à proximité ; à rebours ; à reculons ; à regret ; à son aise ;
à son insu ; à tort ; à tort et à travers ; à tout hasard ;
à tout jamais ; à tout prix ; à toute allure ; à toute vitesse ;
à toutes jambes ; à temps ; à vie ; à voix basse ; à voix haute ;
à volonté ; à vrai dire ; à vue d'œil ; au besoin ; au bout du compte ;
au contraire ; au demeurant ; au début ; au dépourvu ; au détail ;
au fil du temps ; au final ; au fond ; au fur et à mesure ;
au grand jour ; au hasard ; au juste ; au large ; au loin ; au maximum ;
au mieux ; au minimum ; au moins ; au pire ; au pis aller ; au plus tard ;
au plus tôt ; au passage ; au premier abord ; au préalable ;
au reste ; au total ; aux abois ; aux alentours ; aux aguets ;
d'abord ; d'affilée ; d'ailleurs ; d'antan ; d'arrache-pied ;
d'autant plus ; d'autre part ; d'avance ; d'emblée ; d'habitude ;
d'occasion ; d'ordinaire ; d'un coup ; d'un seul coup ; d'une part ;
d'une traite ; d'urgence ; de bon cœur ; de bon gré ; de bonne foi ;
de bonne heure ; de bric et de broc ; de but en blanc ; de ce fait ;
de concert ; de côté ; de face ; de fait ; de fond en comble ;
de force ; de front ; de gré ou de force ; de guingois ; de justesse ;
de loin ; de longue date ; de mal en pis ; de mieux en mieux ;
de même ; de mémoire ; de nos jours ; de nouveau ; de nuit ; de jour ;
de pair ; de part en part ; de pied ferme ; de plein fouet ;
de plein gré ; de plus ; de plus belle ; de plus en plus ;
de moins en moins ; de préférence ; de près ; de prime abord ;
de rigueur ; de retour ; de son mieux ; de suite ; de surcroît ;
de temps en temps ; de temps à autre ; de toute façon ;
de toute évidence ; de toute urgence ; de toutes parts ; de travers ;
de trop ; du coup ; du jour au lendemain ; du moins ; du premier coup ;
du reste ; du tout au tout ; en apparence ; en arrière ; en attendant ;
en avance ; en avant ; en bas ; en bloc ; en bref ; en cachette ;
en catimini ; en chœur ; en clair ; en commun ; en conclusion ;
en conséquence ; en continu ; en contrepartie ; en cours ;
en cours de route ; en définitive ; en dernier lieu ; en dessous ;
en dessus ; en direct ; en douce ; en détail ; en effet ; en fait ;
en famille ; en fin de compte ; en flèche ; en général ; en gros ;
en guise ; en haut ; en hâte ; en l'air ; en l'état ; en l'occurrence ;
en masse ; en moyenne ; en même temps ; en outre ; en particulier ;
en partie ; en passant ; en permanence ; en personne ; en plein air ;
en plein jour ; en pleine nuit ; en plus ; en premier lieu ; en principe ;
en privé ; en public ; en pratique ; en prime ; en priorité ; en propre ;
en question ; en revanche ; en réalité ; en règle ; en résumé ;
en secret ; en silence ; en somme ; en sourdine ; en sus ; en théorie ;
en tout ; en tout cas ; en tous sens ; en un clin d'œil ; en vain ;
en vigueur ; en vitesse ; en vrac ; en vérité ; par accident ;
par ailleurs ; par avance ; par bonheur ; par chance ; par conséquent ;
par contre ; par cœur ; par défaut ; par endroits ; par erreur ;
par exemple ; par excellence ; par hasard ; par inadvertance ;
par instants ; par intervalles ; par la suite ; par malheur ;
par mégarde ; par miracle ; par moments ; par principe ; par surprise ;
par écrit ; sans arrêt ; sans cesse ; sans commentaire ; sans conteste ;
sans délai ; sans détour ; sans doute ; sans encombre ; sans faute ;
sans fin ; sans gêne ; sans relâche ; sans retour ; sans répit ;
sans réserve ; sur-le-champ ; sur le coup ; sur le point ; sur le tard ;
sur mesure ; sur place ; sous peu ; sous presse ; tout à coup ;
tout à fait ; tout à l'heure ; tout au long ; tout au plus ;
tout compte fait ; tout d'abord ; tout d'un coup ; tout de même ;
tout de suite ; tout droit ; tout le monde ; tout le temps ;
tour à tour ; petit à petit ; peu à peu ; peu ou prou ; côte à côte ;
coup sur coup ; face à face ; mot à mot ; pas à pas ; corps à corps ;
dos à dos ; tête à tête ; vis à vis ; çà et là ; ci et là ;
ni plus ni moins ; plus ou moins ; bel et bien ; pour de bon ;
pour ainsi dire ; pour autant ; pour le moment ; pour l'instant ;
pour toujours ; pour l'heure ; pour de vrai ; quelque part ;
nulle part ; autre part ; la plupart du temps ; le cas échéant ;
grosso modo ; illico presto ; in extremis ; ipso facto ;
a fortiori ; a posteriori ; a priori ; bon gré mal gré ;
vaille que vaille ; tant bien que mal ; n'importe comment ;
n'importe où ; n'importe quand ; va savoir ; on ne peut plus ;
qui plus est ; qui pis est ; entre autres ; entre temps ;
jusqu'à présent ; jusqu'au bout ; jusqu'ici ; jusque-là ;
là encore ; par-ci par-là ; au jour le jour ; de A à Z ;
du matin au soir ; du début à la fin ; une fois pour toutes ;
à cette fin ; à cet égard ; à ce jour ; à ce propos ; à ce sujet ;
à ce titre ; à cet effet ; à l'heure actuelle ; à l'heure qu'il est ;
à la première occasion ; à la dernière minute ; à n'en plus finir ;
à perte d'haleine ; à pleines mains ; à plein régime ;
à titre d'exemple ; à titre indicatif ; à tour de rôle ;
à tout moment ; à tous égards ; à toute épreuve ; à visage découvert ;
au cas par cas ; au coup par coup ; au petit bonheur ;
au vu et au su de tous ; comme il faut ; comme tout ; comme quoi ;
coûte que coûte ; en bonne et due forme ; en chair et en os ;
en deux temps trois mouvements ; en long et en large ;
en mon for intérieur ; en toute franchise ; en toute hâte ;
en toute simplicité ; en toutes lettres ; les bras croisés ;
le dos au mur ; par monts et par vaux ; par tous les moyens ;
pieds et poings liés ; sain et sauf ; sens dessus dessous ;
séance tenante ; tant et plus ; tant s'en faut ; tout bien considéré ;
tout bonnement ; tout court ; tout juste ; tout net ; tout un chacun ;
vent debout ; à huis clos ; à tombeau ouvert ; à tue-tête ;
à vol d'oiseau ; au pied levé ; au pied de la lettre ;
de bouche à oreille ; de long en large ; de pied en cap ;
de vive voix ; du tac au tac ; la tête haute ; les yeux fermés ;
sans coup férir ; sans autre forme de procès ; à corps perdu ;
à cœur joie ; à cœur ouvert ; à double tranchant ; à demi-mot ;
à la belle étoile ; à la bonne franquette ; à la sauvette ;
à la sueur de son front ; à l'article de la mort ; à l'œuvre ;
au bout du rouleau ; au pied du mur ; au septième ciel ;
de gaieté de cœur ; en un tournemain ; entre quatre murs ;
entre chien et loup ; haut la main ; la mort dans l'âme ;
sur le bout des doigts ; sur le champ ; sur le vif ; sur parole ;
sur toute la ligne ; à perte ; à profit ; à succès ; à raison ;
à l'essai ; à l'étude ; à la clé ; à la une ; au ralenti ; au repos ;
au sec ; au chaud ; au frais ; au complet ; au clair ; de visu ;
et cetera ; par le menu ; pour mémoire ; pour rire ; pour de faux ;
sans plus ; sans façon ; sans merci ; sans pareil ; sans précédent ;
tant mieux ; tant pis ; très bien ; au revoir ; à demain ;
à tout à l'heure ; d'accord ; bien entendu ; bien sûr ; en personne
"""

CONJ = """
parce que ; alors que ; tandis que ; bien que ; encore que ;
afin que ; pour que ; avant que ; après que ; dès que ; depuis que ;
pendant que ; sans que ; pourvu que ; à moins que ; à condition que ;
de sorte que ; de façon que ; de manière que ; si bien que ;
au cas où ; dans la mesure où ; du moment que ; une fois que ;
chaque fois que ; toutes les fois que ; au fur et à mesure que ;
aussitôt que ; sitôt que ; tant que ; vu que ; étant donné que ;
attendu que ; sous prétexte que ; de même que ; ainsi que ;
autant que ; d'autant que ; d'autant plus que ; si tant est que ;
en attendant que ; jusqu'à ce que ; maintenant que ; à présent que ;
alors même que ; quand bien même ; non seulement ; mais aussi ;
mais encore ; c'est pourquoi ; c'est-à-dire que ; autrement dit ;
en d'autres termes ; par le fait que ; du fait que ; face au fait que ;
pour peu que ; quand même ; tout de même que ; soit que ;
selon que ; suivant que ; outre que ; sauf que ; excepté que ;
hormis que ; loin que ; faute de quoi ; moyennant quoi ;
en sorte que ; à telle enseigne que ; comme si ; même si ; sauf si ;
comme quoi ; or donc ; et puis ; et alors ; ou bien ; ou alors ;
voire même ; ne serait-ce que ; à savoir ; c'est dire
"""

PREP = """
à base de ; à bord de ; à cause de ; à compter de ; à condition de ;
à côté de ; à défaut de ; à destination de ; à force de ; à hauteur de ;
à l'abri de ; à l'aide de ; à l'approche de ; à l'arrière de ;
à l'attention de ; à l'aune de ; à l'avant de ; à l'égard de ;
à l'encontre de ; à l'entrée de ; à l'exception de ; à l'exclusion de ;
à l'extérieur de ; à l'image de ; à l'instar de ; à l'insu de ;
à l'intention de ; à l'intérieur de ; à l'inverse de ; à l'issue de ;
à l'occasion de ; à l'opposé de ; à l'orée de ; à l'écart de ;
à l'échelle de ; à la charge de ; à la différence de ; à la faveur de ;
à la fin de ; à la frontière de ; à la hauteur de ; à la lumière de ;
à la manière de ; à la merci de ; à la mesure de ; à la mode de ;
à la place de ; à la portée de ; à la poursuite de ; à la recherche de ;
à la rencontre de ; à la suite de ; à la surface de ; à la tête de ;
à la veille de ; à la vue de ; à mi-chemin de ; à même ; à mesure que ;
à partir de ; à portée de ; à proportion de ; à propos de ;
à proximité de ; à raison de ; à rebours de ; à seule fin de ;
à titre de ; à travers ; au bas de ; au beau milieu de ; au bénéfice de ;
au bord de ; au bout de ; au centre de ; au cœur de ; au contact de ;
au cours de ; au croisement de ; au début de ; au détriment de ;
au fil de ; au fond de ; au gré de ; au lieu de ; au mépris de ;
au milieu de ; au moment de ; au moyen de ; au niveau de ; au nom de ;
au nord de ; au sud de ; à l'est de ; à l'ouest de ; au pied de ;
au point de ; au prix de ; au profit de ; au regard de ; au risque de ;
au seuil de ; au sein de ; au service de ; au sommet de ; au sortir de ;
au sujet de ; au terme de ; au titre de ; au travers de ; au vu de ;
aux abords de ; aux alentours de ; aux confins de ; aux côtés de ;
aux dépens de ; aux environs de ; aux frais de ; aux mains de ;
aux prises avec ; aux yeux de ; d'après ; d'entre ; d'ici ;
de crainte de ; de façon à ; de la part de ; de manière à ; de peur de ;
du côté de ; du fait de ; du fond de ; du haut de ; du point de vue de ;
en bas de ; en bordure de ; en compagnie de ; en comparaison de ;
en cours de ; en dedans de ; en dehors de ; en dessous de ; en dépit de ;
en direction de ; en face de ; en faveur de ; en fonction de ;
en guise de ; en haut de ; en l'absence de ; en l'honneur de ;
en marge de ; en matière de ; en plein milieu de ; en présence de ;
en proie à ; en quête de ; en raison de ; en termes de ; en tête de ;
en train de ; en travers de ; en vertu de ; en vue de ; face à ;
faute de ; grâce à ; histoire de ; hors de ; jusqu'à ; jusqu'en ;
jusque dans ; le long de ; lors de ; loin de ; par le biais de ;
par l'entremise de ; par l'intermédiaire de ; par rapport à ;
par suite de ; par-delà ; pour cause de ; pour le compte de ;
près de ; quant à ; quitte à ; sous couvert de ; sous forme de ;
sous l'angle de ; sous l'effet de ; sous le coup de ; sous peine de ;
sous prétexte de ; sous réserve de ; suite à ; sur la base de ;
sur le plan de ; sur fond de ; vis-à-vis de ; compte tenu de ;
en échange de ; à l'époque de ; au lendemain de ; à la base de ;
dans le cadre de ; dans le cas de ; dans le sens de ; dans l'ensemble de ;
dans l'attente de ; dans l'intérêt de ; dans la limite de ;
dans la mesure de ; dans le but de ; dans le courant de ;
dans les parages de ; pour ce qui est de ; en ce qui concerne ;
s'agissant de ; eu égard à ; en regard de ; étant donné ; excepté ;
y compris ; non compris ; à destination de ; en provenance de
"""

# verbal idioms: first word is the support verb INFINITIVE (the trie key
# is the lemma, so any conjugated occurrence matches)
VERB = """
avoir l'air ; avoir besoin ; avoir envie ; avoir peur ; avoir raison ;
avoir tort ; avoir faim ; avoir soif ; avoir froid ; avoir chaud ;
avoir sommeil ; avoir honte ; avoir lieu ; avoir beau ; avoir affaire ;
avoir confiance ; avoir conscience ; avoir coutume ; avoir de la chance ;
avoir du mal ; avoir du succès ; avoir hâte ; avoir horreur ;
avoir l'habitude ; avoir l'intention ; avoir l'occasion ;
avoir l'impression ; avoir le droit ; avoir le temps ; avoir le trac ;
avoir les moyens ; avoir mal ; avoir mauvaise conscience ;
avoir bonne mine ; avoir recours ; avoir rendez-vous ; avoir soin ;
avoir tendance ; avoir vent ; avoir voix au chapitre ;
faire attention ; faire confiance ; faire défaut ; faire demi-tour ;
faire des efforts ; faire du bien ; faire du mal ; faire du bruit ;
faire du sport ; faire exprès ; faire face ;
faire faillite ; faire fortune ; faire la cuisine ; faire la fête ;
faire la grève ; faire la guerre ; faire la paix ; faire la queue ;
faire la sieste ; faire le ménage ; faire le point ; faire le tour ;
faire les courses ; faire mal ; faire marche arrière ; faire mine ;
faire naufrage ; faire partie ; faire peau neuve ; faire peur ;
faire plaisir ; faire preuve ; faire savoir ; faire semblant ;
faire signe ; faire son possible ; faire un tour ; faire un vœu ;
faire une promenade ; faire vite ; faire volte-face ;
prendre au sérieux ; prendre conscience ; prendre congé ;
prendre connaissance ; prendre contact ; prendre corps ; prendre effet ;
prendre fin ; prendre forme ; prendre garde ; prendre goût ;
prendre l'air ; prendre la fuite ; prendre la parole ;
prendre le large ; prendre note ; prendre part ; prendre parti ;
prendre peur ; prendre place ; prendre position ; prendre racine ;
prendre rendez-vous ; prendre sa retraite ; prendre soin ;
prendre son temps ; prendre une décision ;
mettre à jour ; mettre à l'épreuve ; mettre à profit ; mettre au point ;
mettre en cause ; mettre en évidence ; mettre en garde ;
mettre en œuvre ; mettre en place ; mettre en question ;
mettre en valeur ; mettre fin ; mettre le cap ; mettre un terme ;
tenir bon ; tenir compte ; tenir parole ; tenir tête ; tenir lieu ;
rendre compte ; rendre hommage ; rendre justice ; rendre service ;
rendre visite ; donner lieu ; donner naissance ; donner raison ;
donner suite ; donner tort ; donner l'alarme ; donner le change ;
donner le ton ; perdre connaissance ; perdre courage ; perdre de vue ;
perdre du terrain ; perdre haleine ; perdre la tête ; perdre patience ;
perdre pied ; porter atteinte ; porter bonheur ; porter malheur ;
porter plainte ; porter secours ; passer commande ; passer inaperçu ;
passer outre ; passer sous silence ; venir à bout ; aller de soi ;
aller de pair ; aller bon train ; dire vrai ; vouloir dire ;
savoir gré ; voir le jour ; reprendre haleine ; reprendre ses esprits ;
courir le risque ; crier victoire ; entrer en vigueur ;
entrer en jeu ; entrer en scène ; jouer un rôle ; livrer bataille ;
monter la garde ; poser problème ; poser question ; sonner l'alarme ;
trouver porte close ; tirer parti ; tirer profit ; tourner la page ;
gagner du temps ; gagner du terrain ; garder le silence ;
garder son calme ; joindre les deux bouts ; laisser tomber ;
lever le camp ; dresser l'oreille ; tendre l'oreille ;
battre son plein ; briser la glace ; brûler les étapes ;
casser les pieds ; chercher noise ; couper court ; crever les yeux ;
dormir debout ; fermer les yeux ; forcer la main ; froncer les sourcils ;
hausser les épaules ; hocher la tête ; montrer patte blanche ;
ouvrir la voie ; payer les pots cassés ; plier bagage ;
toucher du bois ; tourner bride ; vider les lieux
"""

# noun compounds (SUB) — everyday dictionary compounds
SUB = """
chemin de fer ; pomme de terre ; coup d'œil ; coup d'état ;
coup de foudre ; coup de grâce ; coup de main ; coup de pied ;
coup de poing ; coup de soleil ; coup de téléphone ; coup de tête ;
coup de théâtre ; coup de vent ; point de vue ; point de repère ;
point de départ ; point de mire ; point de non-retour ; point du jour ;
salle à manger ; salle de bain ; salle de classe ; salle d'attente ;
salle de séjour ; chambre à coucher ; fer à repasser ; fer à cheval ;
machine à laver ; machine à écrire ; machine à coudre ; moulin à vent ;
moulin à eau ; moulin à café ; corbeille à papier ; brosse à dents ;
pâte à modeler ; planche à voile ; sac à dos ; sac à main ;
verre à vin ; boîte aux lettres ; boîte de nuit ; boîte de vitesses ;
arc de triomphe ; armée de terre ; armée de l'air ; arme à feu ;
baie vitrée ; bande dessinée ; bas de laine ; bec de gaz ; belle saison ; billet de banque ;
bon sens ; bouche à oreille ; bras de fer ; bras droit ;
carte de visite ; carte d'identité ; carte postale ; cas de figure ;
cercle vicieux ; chef de famille ; chef de gare ; chef d'œuvre ;
chef d'état ; chemin de traverse ; cheval de bataille ;
cheval de course ; cheville ouvrière ; chiffre d'affaires ;
clair de lune ; classe moyenne ; clin d'œil ; code de la route ;
coin de rue ; compte rendu ; conseil d'administration ;
corps enseignant ; cour d'appel ; cour de récréation ; cours d'eau ;
court de tennis ; croix rouge ; cul de sac ; disque dur ;
douche froide ; droit d'auteur ; droits de l'homme ; eau de vie ;
eau douce ; eau potable ; effet de serre ; emploi du temps ;
esprit de corps ; essence de térébenthine ; face cachée ;
fait divers ; fait accompli ; femme de chambre ; femme de ménage ;
fête foraine ; feu d'artifice ; feu rouge ; feu vert ; fil de fer ;
fin de semaine ; fonds de commerce ; force de frappe ;
garde champêtre ; garde du corps ; gaz à effet de serre ;
grand écran ; grande surface ; grève de la faim ; guerre froide ;
homme d'affaires ; homme d'état ; homme de lettres ; homme de main ;
homme de paille ; hôtel de ville ; huile d'olive ; idée reçue ;
jardin d'enfants ; jeu de mots ; jeu de société ; jour de l'an ;
juge d'instruction ; langue de bois ; lettre de change ;
lieu commun ; ligne de conduite ; ligne de mire ; lit de camp ;
livre de poche ; longueur d'onde ; lune de miel ; main d'œuvre ;
maison de campagne ; maison de retraite ; maison d'édition ;
maître d'hôtel ; maître d'œuvre ; mal de mer ; mal de tête ;
mal du pays ; marche arrière ; marché noir ; matière grise ;
matière première ; mise au point ; mise en demeure ; mise en garde ;
mise en scène ; mise en œuvre ; mode d'emploi ; mode de vie ;
monnaie courante ; mont de piété ; mot d'ordre ; mot de passe ;
moteur de recherche ; moyen âge ; nature morte ; niveau de vie ;
nom de famille ; nom de plume ; nuit blanche ; numéro de téléphone ;
œil de bœuf ; ordre du jour ; papier peint ; parti pris ;
partie de campagne ; pays de cocagne ; peine de mort ;
permis de conduire ; pied à terre ; pierre de touche ;
pierre d'achoppement ; plan d'eau ; point chaud ; point faible ;
point fort ; point mort ; point noir ; pomme d'Adam ; pont aux ânes ;
porte de sortie ; poste de police ; pot de vin ; poudre aux yeux ;
premier plan ; prise de conscience ; prise de position ;
prise de courant ; prix de revient ; quartier général ;
question de confiance ; raison d'état ; raison d'être ;
rapport de force ; rayon de soleil ; robe de chambre ; roman policier ; rond point ;
ruée vers l'or ; salle des fêtes ; sens commun ; sens unique ;
table des matières ; table ronde ; tableau de bord ;
tapis roulant ; taux d'intérêt ; témoin oculaire ; terre à terre ;
tête de liste ; tête de mort ; tiers état ; tour de force ;
tour de main ; tour d'horizon ; tour d'ivoire ; train de vie ;
trait d'union ; tranche de vie ; travaux forcés ; vache à lait ;
valeur ajoutée ; vente aux enchères ; ver à soie ; vide juridique ;
vie privée ; ville d'eau ; vin de table ; voie ferrée ; voie lactée ;
vol à main armée ; volonté de fer ; vue d'ensemble ; zone bleue ;
bouc émissaire ; carte blanche ; château fort ; cheval de Troie ;
cordon bleu ; état civil ; état d'esprit ; état d'âme ;
état de siège ; état des lieux ; fait du prince ; franc parler ;
libre arbitre ; libre échange ; lieu de travail ; lieu de naissance ;
marge de manœuvre ; milieu de terrain ; ministère public ;
pouvoir d'achat ; salle de spectacle ; secret de polichinelle ;
société anonyme ; temps mort ; terrain d'entente ; titre de transport ;
vitesse de croisière ; champ de bataille ; corps à corps ; coût de la vie ; dent de lait ; dernier cri ;
esprit d'équipe ; fil conducteur ; fond de teint ; fou rire ;
franc jeu ; gros plan ; gros titre ; haute couture ; haut lieu ;
heure de pointe ; homme de confiance ; lettre morte ; levée de boucliers ;
loi du silence ; longue vue ; lutte des classes ; maison mère ;
mal du siècle ; nerf de la guerre ; paire de lunettes ;
panier percé ; partie de cartes ; pas de porte ; patte blanche ;
perte de temps ; pied de nez ; pierre angulaire ; poids lourd ;
poids mort ; poids plume ; poignée de main ; pomme de discorde ;
preuve par neuf ; prix fort ; prix de gros ;
question piège ; retour de flamme ; rideau de fer ; sang froid ;
signe de vie ; soupe au lait ; système nerveux ; telle quelle ;
tour de garde ; vieux jeu ; vif du sujet ; vol de nuit
"""

# pronominal / determiner locutions
PRO = """
n'importe qui ; n'importe quoi ; n'importe quel ; n'importe quelle ;
n'importe quels ; n'importe quelles ; n'importe lequel ;
quelqu'un d'autre ; quelque chose ; grand chose ; qui que ce soit ;
quoi que ce soit ; tout un chacun ; l'un et l'autre ;
l'un ou l'autre ; ni l'un ni l'autre ; tout le monde ;
la plupart ; bon nombre ; quantité de ; bien des ; pas mal de ;
un tas de ; une foule de ; un bon nombre de ; la totalité de ;
l'ensemble de ; la majorité de ; une partie de ; le reste de
"""


def _iter_display(block: str):
    for raw in block.replace("\n", " ").split(";"):
        form = " ".join(raw.split()).strip()
        if not form:
            continue
        yield form


_ELISION_LOWER = {k.lower(): v for k, v in D.ELISION.items()}


def _split_tokens(display: str) -> list[str]:
    """Display form → the token sequence the tokenizer produces:
    space-split, elision prefixes expanded (the tokenizer replaces
    them, FrTokenizer.java:431-437), and hyphenated words split at the
    LAST hyphen when the tail is an enclitic — exactly the tokenizer's
    HYPHEN_POST rule, euphonic -t included — so 'rendez-vous' compiles
    to the ('rendez', 'vous') stream the walk actually sees."""
    toks: list[str] = []
    for w in display.split(" "):
        while True:
            apos = w.find("'")
            prefix = w[: apos + 1] if apos >= 0 else None
            if (
                prefix
                and prefix.lower() in _ELISION_LOWER
                and len(w) > apos + 1
            ):
                toks.append(_ELISION_LOWER[prefix.lower()])
                w = w[apos + 1 :]
                continue
            break
        if not w:
            continue
        hy = w.rfind("-")
        tail = w[hy + 1 :] if hy > 0 else ""
        if tail in D.HYPHEN_POST:
            head = w[:hy]
            if head.endswith("-t"):
                head = head[:-2]
            toks.append(head)
            toks.append(tail)
        else:
            toks.append(w)
    return toks


def _token_key(surface: str, words: dict) -> str:
    """The compound key this surface form contributes at match time —
    the same selection as ``french._loc_key`` applied to what the
    lemmatizer will have produced for it (lowercase path; locutions are
    authored lowercase except proper-noun parts), including the
    pris/prise' participle guard shared via fr_dicts.ORTH_NOT_VERB."""
    low = surface.lower()
    if low in D.ORTH_NOT_VERB:
        return low
    e = words.get(low)
    if e is not None:
        tag, orth, lem = e
        if lem and D.group(tag) == D.VERB:
            return lem
        if D.group(tag) in (D.NAME, D.SUB):
            return surface
        return orth or low if low == surface else surface
    return surface


def build_locutions() -> dict[tuple[str, ...], tuple[str, int, str | None]]:
    """All authored locutions compiled to
    key-tuple → (display orth, tag, lemma)."""
    from alix_spark.analysis.fr_lexicon import merged_lexicon

    words = merged_lexicon()
    out: dict[tuple[str, ...], tuple[str, int, str | None]] = {}
    for block, tag in (
        (ADV, D.ADV),
        (CONJ, D.CONJ),
        (PREP, D.PREP),
        (VERB, D.VERB),
        (SUB, D.SUB),
        (PRO, D.PRO),
    ):
        for display in _iter_display(block):
            toks = _split_tokens(display)
            if len(toks) < 2:
                continue
            key = tuple(_token_key(t, words) for t in toks)
            out[key] = (display, tag, None)
    return out
