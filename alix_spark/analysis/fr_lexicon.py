"""Full-size French lexicon, generated from public-knowledge morphology.

The reference ships a ~130k-type ``word.csv``
(``/root/reference/java/alix/lucene/analysis/FrDics.java:82-83``; the
file itself is stripped from its snapshot). This module rebuilds a
real — if smaller — lexicon the honest way available offline: a curated
inventory of common French lemmas (verbs, nouns, adjectives, adverbs)
expanded through the standard inflection rules of French grammar
(conjugation of the three verb groups with the usual spelling
adjustments, noun/adjective plural and feminine formation, -ment adverb
derivation). Everything here is textbook French morphology; no external
resource is copied.

Output shape matches ``fr_dicts.WORDS`` / ``load_lexicon_csv``:
``graph → (tag, orth, lemma)``. ~33k distinct inflected forms from
~1,800 lemmas — enough that ``fr_analysis`` on real French text
lemmatizes the overwhelming majority of plain-vocabulary tokens, while
the compact ``fr_dicts.WORDS`` (function words, locutions, names) keeps
priority at merge time in consumers.
"""

from __future__ import annotations

from alix_spark.analysis import fr_dicts as D
from alix_spark.analysis import fr_lexicon2 as X
from alix_spark.analysis import fr_lexicon3 as Y
from alix_spark.analysis import fr_lexicon4 as Z

# --------------------------------------------------------------------- #
# lemma inventories (curated common vocabulary — ~1,800 lemmas)
# --------------------------------------------------------------------- #

# 1st group (-er) regular verbs, incl. -ger/-cer/-yer spelling families
VERBS_ER = """
parler donner aimer chanter danser jouer regarder écouter travailler
habiter penser trouver chercher demander passer rester entrer montrer
porter garder laisser tomber arriver monter marcher sembler gagner
toucher fermer tourner tirer pousser frapper casser couper
briller pleurer rêver sauter crier raconter expliquer présenter préparer
décider oublier accepter refuser aider inviter visiter quitter traverser
continuer arrêter attraper lancer avancer placer annoncer
prononcer forcer effacer glisser remplacer menacer percer tracer bercer
déplacer renoncer exercer divorcer grimacer pincer rincer coincer froncer
manger bouger changer nager voyager ranger mélanger partager plonger
songer juger charger décharger diriger corriger protéger3 négliger
obliger exiger déranger venger allonger prolonger interroger loger
déménager encourager engager soulager échanger arranger dégager
nettoyer employer envoyer0 appuyer essuyer ennuyer noyer tutoyer
vouvoyer aboyer côtoyer renvoyer0 déployer broyer
payer essayer balayer effrayer rayer relayer bégayer
acheter1 lever1 mener1 peser1 semer1 achever1 promener1 amener1
emmener1 enlever1 relever1 élever1 crever1 soulever1 ramener1
appeler2 rappeler2 épeler2 renouveler2 jeter2 rejeter2 projeter2
feuilleter2 étiqueter2 cacheter2
préférer3 céder3 espérer3 répéter3 compléter3 posséder3 précéder3
régler3 inquiéter3 considérer3 libérer3 opérer3 pénétrer3 sécher3
révéler3 suggérer3 exagérer3 gérer3 digérer3 tolérer3 célébrer3
accélérer3 énumérer3 interpréter3 succéder3 déléguer3 léguer3
aller0 envoyer1
étudier crier0 remercier apprécier associer copier varier plier marier
confier justifier modifier vérifier signifier simplifier multiplier
oublier0 identifier certifier négocier différencier photographier
téléphoner dîner déjeuner cuisiner goûter saler poivrer mixer verser
griller mijoter assaisonner éplucher découper hacher fouetter
saupoudrer beurrer fariner dorer caraméliser
programmer coder compiler tester déboguer installer configurer exécuter
calculer copier0 coller supprimer sauvegarder télécharger importer
exporter filtrer trier indexer analyser optimiser valider documenter
former informer transformer réformer performer chômer consommer nommer
renommer sommer assommer gommer
fumer allumer parfumer plumer écumer exhumer
river arriver0 priver activer motiver cultiver dériver captiver
observer réserver conserver préserver énerver
créer agréer procréer recréer suppléer
saluer évaluer évoluer attribuer contribuer distribuer situer
constituer instituer substituer habituer accentuer effectuer tuer
remuer éternuer insinuer diminuer continuer0 polluer
adorer ignorer décorer explorer implorer dévorer améliorer détériorer
mémoriser autoriser favoriser réaliser utiliser organiser analyser0
moderniser généraliser normaliser localiser mobiliser civiliser
stériliser styliser symboliser synthétiser baptiser maîtriser mépriser
caractériser critiquer fabriquer indiquer expliquer0 appliquer
communiquer compliquer dupliquer impliquer revendiquer pratiquer
provoquer évoquer convoquer invoquer choquer bloquer croquer moquer
stocker cliquer risquer masquer confisquer brusquer
marquer remarquer embarquer débarquer
causer poser proposer disposer exposer imposer opposer reposer supposer
composer déposer user amuser accuser excuser refuser0 abuser épuiser
creuser oser arroser
bavarder tarder retarder regarder0 garder0 bombarder
border aborder déborder accorder raccorder recorder
aider0 décider0 valider0 solder démolder
commander recommander demander0 amender
fonder gronder sonder abonder inonder
souder dénouer nouer renouer avouer louer jouer0 échouer secouer
clouer trouer
baisser abaisser rabaisser laisser0 délaisser graisser engraisser
caresser presser stresser adresser dresser redresser progresser
régresser agresser confesser professer cesser blesser
chasser classer déclasser ramasser amasser entasser dépasser repasser
brosser carrosser désosser adosser endosser
pénaliser égaliser réviser diviser superviser improviser
baser phraser écraser embraser
causer0 pauser
miser déguiser attiser
briser irriser friser griser
ruser buser museler2
river0 livrer délivrer enivrer
montrer0 démontrer concentrer rencontrer éventrer
entrer0 rentrer centrer recentrer
fêter prêter arrêter0 apprêter regretter guetter endetter
racheter1 fureter1
noter annoter dénoter voter dévoter doter flotter frotter trotter
gratter flatter
habiter0 débiter militer visiter0 agiter méditer éditer créditer
accréditer auditer imiter inviter0 éviter graviter léviter limiter
délimiter féliciter solliciter susciter ressusciter exciter inciter
réciter0 hésiter
monter0 démonter remonter raconter0 conter compter recompter
dompter prompter
chanter0 déchanter enchanter planter replanter implanter supplanter
vanter inventer tenter contenter patienter orienter désorienter
alimenter augmenter commenter fermenter tourmenter fréquenter
présenter0 représenter absenter accidenter
pointer appointer suinter
douter redouter ajouter écouter0 goûter0 dégoûter envoûter
coûter crouter
abriter mériter hériter0 irriter attrister
adopter opter capter intercepter excepter accepter0
porter0 apporter emporter exporter0 importer0 rapporter reporter
supporter transporter déporter colporter
rater mater dater mandater constater dilater éclater relater flatter0
tâter
signer désigner assigner résigner aligner souligner témoigner soigner
éloigner gagner0 régner3 saigner baigner peigner enseigner renseigner
accompagner épargner gratter0 quitter0 agiter0
tomber0 plomber bomber succomber incomber
chercher0 marcher0 toucher0 coucher accoucher boucher déboucher
mâcher cracher arracher attacher détacher cacher fâcher gâcher lâcher
pencher trancher brancher débrancher étancher
pêcher empêcher dépêcher prêcher lécher3
piocher approcher reprocher accrocher décrocher
brûler calculer0 reculer circuler articuler basculer bousculer
accumuler stimuler simuler dissimuler formuler
régaler installer0 caler décaler intercaler signaler avaler dévaler
gonfler dégonfler souffler siffler gifler ronfler renifler
parler0 hurler brûler0 défiler filer enfiler profiler
voler survoler dévoler envoler frôler rigoler racoler
couler écouler rouler dérouler enrouler refouler
peupler dépeupler accoupler coupler
sauver laver délaver relaver graver aggraver
rêver0 abreuver éprouver prouver approuver
trouver0 retrouver
creuser0 épouser exploser imploser déposer0 entreposer
poser0 pauser0
durer endurer perdurer murer emmurer assurer rassurer mesurer
censurer fissurer saturer facturer fracturer capturer torturer
clôturer figurer défigurer
tirer0 étirer retirer soupirer expirer inspirer respirer transpirer
admirer mirer virer revirer chavirer
adorer0 colorer décolorer odorer perforer
honorer déshonorer majorer
pleurer0 effleurer affleurer demeurer
jurer injurier0 abjurer conjurer
errer serrer desserrer enterrer atterrer ferrer
tacher tâcher0 faucher chevaucher embaucher débaucher
""".split()

# 2nd group (-ir, finir type: -issons)
VERBS_IR2 = """
finir agir choisir réussir remplir réfléchir grandir vieillir rougir
blanchir noircir jaunir verdir brunir pâlir grossir maigrir mincir rôtir
élargir rétrécir raccourcir ralentir alourdir adoucir durcir
épaissir affaiblir enrichir appauvrir embellir enlaidir rajeunir assainir
guérir nourrir pourrir fleurir mûrir saisir choisir0 bâtir garantir
définir réunir unir punir bannir fournir accomplir établir rétablir
affranchir franchir avertir convertir divertir investir applaudir
atterrir obéir désobéir envahir gravir subir ravir trahir éblouir
évanouir réjouir jouir bondir rebondir arrondir approfondir abolir
démolir polir salir vomir frémir gémir rugir surgir
""".split()

# 3rd group regular -re (vendre type: -ds, -d, vendu)
VERBS_RE = """
vendre attendre entendre répondre perdre rendre descendre défendre
dépendre prétendre confondre fondre tondre mordre tordre détendre
étendre suspendre correspondre pondre pendre fendre revendre
""".split()

# irregular verbs: lemma -> space-separated distinct forms
# (hand-written paradigms — standard conjugation tables, all persons/
# tenses of indicative/subjunctive/conditional + participles)
VERBS_IRREGULAR: dict[str, str] = {
    "être": "suis es est sommes êtes sont étais était étions étiez "
            "étaient fus fut fûmes fûtes furent serai seras sera serons "
            "serez seront serais serait serions seriez seraient sois "
            "soit soyons soyez soient fusse fût été étant",
    "avoir": "ai as a avons avez ont avais avait avions aviez avaient "
             "eus eut eûmes eûtes eurent aurai auras aura aurons aurez "
             "auront aurais aurait aurions auriez auraient aie aies ait "
             "ayons ayez aient eusse eût eu eue eus0 eues ayant",
    "aller": "vais vas va allons allez vont allais allait allions alliez "
             "allaient allai alla allâmes allèrent irai iras ira irons "
             "irez iront irais irait irions iriez iraient aille ailles "
             "aillent allé allée allés allées allant",
    "faire": "fais fait faisons faites font faisais faisait faisions "
             "faisiez faisaient fis fit fîmes fîtes firent ferai feras "
             "fera ferons ferez feront ferais ferait ferions feriez "
             "feraient fasse fasses fassions fassiez fassent faite faits "
             "faites0 faisant",
    "dire": "dis dit disons dites disent disais disait disions disiez "
            "disaient dîmes dîtes dirent dirai diras dira dirons direz "
            "diront dirais dirait dirions diriez diraient dise dises "
            "disions0 disiez0 dite dits dites1 disant",
    "pouvoir": "peux puis peut pouvons pouvez peuvent pouvais pouvait "
               "pouvions pouviez pouvaient pus put pûmes pûtes purent "
               "pourrai pourras pourra pourrons pourrez pourront "
               "pourrais pourrait pourrions pourriez pourraient puisse "
               "puisses puissions puissiez puissent pu pouvant",
    "vouloir": "veux veut voulons voulez veulent voulais voulait "
               "voulions vouliez voulaient voulus voulut voulûmes "
               "voulurent voudrai voudras voudra voudrons voudrez "
               "voudront voudrais voudrait voudrions voudriez "
               "voudraient veuille veuilles veuillent veuillez voulu "
               "voulue voulus0 voulues voulant",
    "savoir": "sais sait savons savez savent savais savait savions "
              "saviez savaient sus sut sûmes sûtes surent saurai sauras "
              "saura saurons saurez sauront saurais saurait saurions "
              "sauriez sauraient sache saches sachions sachiez sachent "
              "su sue sus0 sues sachant",
    "devoir": "dois doit devons devez doivent devais devait devions "
              "deviez devaient dus dut dûmes dûtes durent devrai devras "
              "devra devrons devrez devront devrais devrait devrions "
              "devriez devraient doive doives doivent0 dû due dus0 dues "
              "devant",
    "venir": "viens vient venons venez viennent venais venait venions "
             "veniez venaient vins vint vînmes vîntes vinrent viendrai "
             "viendras viendra viendrons viendrez viendront viendrais "
             "viendrait viendrions viendriez viendraient vienne viennes "
             "viennent0 venu venue venus venues venant",
    "tenir": "tiens tient tenons tenez tiennent tenais tenait tenions "
             "teniez tenaient tins tint tînmes tîntes tinrent tiendrai "
             "tiendras tiendra tiendrons tiendrez tiendront tiendrais "
             "tiendrait tiendrions tiendriez tiendraient tienne tiennes "
             "tiennent0 tenu tenue tenus tenues tenant",
    "prendre": "prends prend prenons prenez prennent prenais prenait "
               "prenions preniez prenaient pris prit prîmes prîtes "
               "prirent prendrai prendras prendra prendrons prendrez "
               "prendront prendrais prendrait prendrions prendriez "
               "prendraient prenne prennes prennent0 prise prises "
               "prenant",
    "mettre": "mets met mettons mettez mettent mettais mettait mettions "
              "mettiez mettaient mis mit mîmes mîtes mirent mettrai "
              "mettras mettra mettrons mettrez mettront mettrais "
              "mettrait mettrions mettriez mettraient mette mettes "
              "mise mises mettant",
    "voir": "vois voit voyons voyez voient voyais voyait voyions voyiez "
            "voyaient vis vit vîmes vîtes virent verrai verras verra "
            "verrons verrez verront verrais verrait verrions verriez "
            "verraient voie voies vu vue vus vues voyant",
    "croire": "crois croit croyons croyez croient croyais croyait "
              "croyions croyiez croyaient crus crut crûmes crûtes "
              "crurent croirai croiras croira croirons croirez croiront "
              "croirais croirait croirions croiriez croiraient croie "
              "croies cru crue crues croyant",
    "connaître": "connais connaît connaissons connaissez connaissent "
                 "connaissais connaissait connaissions connaissiez "
                 "connaissaient connus connut connûmes connurent "
                 "connaîtrai connaîtras connaîtra connaîtrons connaîtrez "
                 "connaîtront connaîtrais connaîtrait connaîtrions "
                 "connaîtriez connaîtraient connaisse connaisses connu "
                 "connue connus0 connues connaissant",
    "partir": "pars part partons partez partent partais partait "
              "partions partiez partaient partis partit partîmes "
              "partirent partirai partiras partira partirons partirez "
              "partiront partirais partirait partirions partiriez "
              "partiraient parte partes parti partie partis0 parties "
              "partant",
    "sortir": "sors sort sortons sortez sortent sortais sortait "
              "sortions sortiez sortaient sortis sortit sortîmes "
              "sortirent sortirai sortiras sortira sortirons sortirez "
              "sortiront sortirais sortirait sortirions sortiriez "
              "sortiraient sorte sortes sorti sortie sortis0 sorties "
              "sortant",
    "dormir": "dors dort dormons dormez dorment dormais dormait "
              "dormions dormiez dormaient dormis dormit dormîmes "
              "dormirent dormirai dormiras dormira dormirons dormirez "
              "dormiront dormirais dormirait dormirions dormiriez "
              "dormiraient dorme dormes dormi dormant",
    "servir": "sers sert servons servez servent servais servait "
              "servions serviez servaient servis servit servîmes "
              "servirent servirai serviras servira servirons servirez "
              "serviront servirais servirait servirions serviriez "
              "serviraient serve serves servi servie servis0 servies "
              "servant",
    "sentir": "sens sent sentons sentez sentent sentais sentait "
              "sentions sentiez sentaient sentis sentit sentîmes "
              "sentirent sentirai sentiras sentira sentirons sentirez "
              "sentiront sentirais sentirait sentirions sentiriez "
              "sentiraient sente sentes senti sentie sentis0 senties "
              "sentant",
    "écrire": "écris écrit écrivons écrivez écrivent écrivais écrivait "
              "écrivions écriviez écrivaient écrivis écrivit écrivîmes "
              "écrivirent écrirai écriras écrira écrirons écrirez "
              "écriront écrirais écrirait écririons écririez écriraient "
              "écrive écrives écrite écrits écrites écrivant",
    "lire": "lis lit lisons lisez lisent lisais lisait lisions lisiez "
            "lisaient lus lut lûmes lûtes lurent lirai liras lira "
            "lirons lirez liront lirais lirait lirions liriez liraient "
            "lise lises lu lue lus0 lues lisant",
    "boire": "bois boit buvons buvez boivent buvais buvait buvions "
             "buviez buvaient bus but bûmes bûtes burent boirai boiras "
             "boira boirons boirez boiront boirais boirait boirions "
             "boiriez boiraient boive boives bu0 bue bus0 bues buvant",
    "recevoir": "reçois reçoit recevons recevez reçoivent recevais "
                "recevait recevions receviez recevaient reçus reçut "
                "reçûmes reçurent recevrai recevras recevra recevrons "
                "recevrez recevront recevrais recevrait recevrions "
                "recevriez recevraient reçoive reçoives reçu reçue "
                "reçus0 reçues recevant",
    "vivre": "vis vit vivons vivez vivent vivais vivait vivions viviez "
             "vivaient vécus vécut vécûmes vécurent vivrai vivras vivra "
             "vivrons vivrez vivront vivrais vivrait vivrions vivriez "
             "vivraient vive vives vécu vécue vécus0 vécues vivant",
    "suivre": "suis0 suit suivons suivez suivent suivais suivait "
              "suivions suiviez suivaient suivis suivit suivîmes "
              "suivirent suivrai suivras suivra suivrons suivrez "
              "suivront suivrais suivrait suivrions suivriez suivraient "
              "suive suives suivi suivie suivis0 suivies suivant",
    "mourir": "meurs meurt mourons mourez meurent mourais mourait "
              "mourions mouriez mouraient mourus mourut mourûmes "
              "moururent mourrai mourras mourra mourrons mourrez "
              "mourront mourrais mourrait mourrions mourriez "
              "mourraient meure meures mort morte morts mortes mourant",
    "naître": "nais naît naissons naissez naissent naissais naissait "
              "naissions naissiez naissaient naquis naquit naquîmes "
              "naquirent naîtrai naîtras naîtra naîtrons naîtrez "
              "naîtront naîtrais naîtrait naîtrions naîtriez naîtraient "
              "naisse naisses né née nés nées naissant",
    "ouvrir": "ouvre ouvres ouvrons ouvrez ouvrent ouvrais ouvrait "
              "ouvrions ouvriez ouvraient ouvris ouvrit ouvrîmes "
              "ouvrirent ouvrirai ouvriras ouvrira ouvrirons ouvrirez "
              "ouvriront ouvrirais ouvrirait ouvririons ouvririez "
              "ouvriraient ouvert ouverte ouverts ouvertes ouvrant",
    "courir": "cours court courons courez courent courais courait "
              "courions couriez couraient courus courut courûmes "
              "coururent courrai courras courra courrons courrez "
              "courront courrais courrait courrions courriez "
              "courraient coure coures couru courue courus0 courues "
              "courant",
    "rire": "ris rit rions riez rient riais riait riions riiez riaient "
            "rîmes rirent rirai riras rira rirons rirez riront rirais "
            "rirait ririons ririez riraient rie ries ri riant",
    "plaire": "plais plaît plaisons plaisez plaisent plaisais plaisait "
              "plaisions plaisiez plaisaient plus0 plut plûmes plurent "
              "plairai plairas plaira plairons plairez plairont "
              "plairais plairait plairions plairiez plairaient plaise "
              "plaises plu plaisant",
    "falloir": "faut fallait fallut faudra faudrait faille fallu",
    "pleuvoir": "pleut pleuvait plut0 pleuvra pleuvrait pleuve plu0 "
                "pleuvant",
    "valoir": "vaux vaut valons valez valent valais valait valions "
              "valiez valaient valus valut valûmes valurent vaudrai "
              "vaudras vaudra vaudrons vaudrez vaudront vaudrais "
              "vaudrait vaudrions vaudriez vaudraient vaille vailles "
              "valu value valant",
    # round-5 additions: the major 3rd-group verbs the common-verb
    # audit found missing (battre, conclure, vaincre, fuir, acquérir,
    # cueillir, coudre, asseoir…), plus envoyer — whose -ER skip
    # guard had no matching paradigm, leaving it formless
    "battre": "bats bat battons battez battent battais battait "
              "battions battiez battaient battis battit battîmes "
              "battirent battîtes battrai battras battra battrons battrez "
              "battront battrais battrait battrions battriez "
              "battraient batte battes battent0 battu battue battus "
              "battues battant",
    "conclure": "conclus conclut concluons concluez concluent "
                "concluais concluait concluions concluiez concluaient "
                "conclûmes conclûtes conclurent conclurai concluras conclura "
                "conclurons conclurez concluront conclurais conclurait "
                "conclurions concluriez concluraient conclue conclues "
                "conclu conclue0 conclues0 concluant",
    "rompre": "romps rompt rompons rompez rompent rompais rompait "
              "rompions rompiez rompaient rompis rompit rompîmes "
              "rompirent romprai rompras rompra romprons romprez "
              "rompront romprais romprait romprions rompriez "
              "rompraient rompe rompes rompu rompue rompus rompues "
              "rompant",
    "vaincre": "vaincs vainc vainquons vainquez vainquent vainquais "
               "vainquait vainquions vainquiez vainquaient vainquis "
               "vainquit vainquîmes vainquirent vaincrai vaincras "
               "vaincra vaincrons vaincrez vaincront vaincrais "
               "vaincrait vaincrions vaincriez vaincraient vainque "
               "vainques vaincu vaincue vaincus vaincues vainquant",
    "fuir": "fuis fuit fuyons fuyez fuient fuyais fuyait fuyions "
            "fuyiez fuyaient fuîmes fuîtes fuirent fuirai fuiras fuira "
            "fuirons fuirez fuiront fuirais fuirait fuirions fuiriez "
            "fuiraient fuie fuies fui fuie0 fuis0 fuies0 fuyant",
    "acquérir": "acquiers acquiert acquérons acquérez acquièrent "
                "acquérais acquérait acquérions acquériez acquéraient "
                "acquis acquit acquîmes acquirent acquerrai acquerras "
                "acquerra acquerrons acquerrez acquerront acquerrais "
                "acquerrait acquerrions acquerriez acquerraient "
                "acquière acquières acquise acquises acquérant",
    "cueillir": "cueille cueilles cueillons cueillez cueillent "
                "cueillais cueillait cueillions cueilliez cueillaient "
                "cueillis cueillit cueillîmes cueillirent cueillerai "
                "cueilleras cueillera cueillerons cueillerez "
                "cueilleront cueillerais cueillerait cueillerions "
                "cueilleriez cueilleraient cueilli cueillie cueillis0 "
                "cueillies cueillant",
    "bouillir": "bous bout bouillons bouillez bouillent bouillais "
                "bouillait bouillions bouilliez bouillaient bouillis "
                "bouillit bouillirent bouillirai bouilliras bouillira "
                "bouillîmes bouillîtes bouillirons bouillirez bouilliront bouillirais "
                "bouillirait bouillirions bouilliriez bouilliraient "
                "bouille bouilles "
                "bouilli bouillie bouillis0 bouillies bouillant",
    "coudre": "couds coud cousons cousez cousent cousais cousait "
              "cousions cousiez cousaient cousis cousit cousirent "
              "coudrai coudras coudra coudrons coudrez coudront "
              "coudrais coudrait coudrions coudriez coudraient couse "
              "couses cousu cousue cousus cousues cousant",
    "moudre": "mouds moud moulons moulez moulent moulais moulait "
              "moulions mouliez moulaient moulus moulut moulurent "
              "moulûmes moudrai moudras moudra moudrons moudrez moudront "
              "moudrais moudrait moudrions moudriez moudraient "
              "moule moules moulu moulue moulus0 moulues moulant",
    "suffire": "suffis suffit suffisons suffisez suffisent suffisais "
               "suffisait suffisions suffisiez suffisaient suffîmes "
               "suffirent suffirai suffiras suffira suffirons suffirez "
               "suffiront suffirais suffirait suffirions suffiriez suffiraient "
               "suffise suffises suffi suffisant",
    "croître": "croîs croît croissons croissez croissent croissais "
               "croissait croissions croissiez croissaient crûs crût "
               "crûmes crûtes crûrent croîtrai croîtras croîtra croîtrons "
               "croîtrez croîtront croîtrais croîtrait croîtrions croîtriez "
               "croîtraient croisse croisses crû crue crus0 "
               "crues croissant",
    "résoudre": "résous résout résolvons résolvez résolvent résolvais "
                "résolvait résolvions résolviez résolvaient résolus "
                "résolut résolurent résoudrai résoudras résoudra "
                "résoudrons résoudrez résoudront résoudrais résoudrait "
                "résoudrions résoudriez résoudraient résolve résolves "
                "résolu résolue résolus0 résolues résolvant",
    "asseoir": "assieds assied asseyons asseyez asseyent asseyais "
               "asseyait asseyions asseyiez asseyaient assis assit "
               "assîmes assirent assiérai assiéras assiéra assiérons "
               "assiérez assiéront assiérais assiérait assiérions assiériez "
               "assiéraient assoirais assoirait asseye asseyes "
               "assois assoit assoyons assoyez assoient assoirai "
               "assoiras assoira assoirons assoirez assoiront assise "
               "assises assis0 asseyant assoyant",
    "émouvoir": "émeus émeut émouvons émouvez émeuvent émouvais "
                "émouvait émouvions émouviez émouvaient émus émut "
                "émûmes émurent émouvrai émouvras émouvra émouvrons "
                "émouvrez émouvront émouvrais émouvrait émouvrions "
                "émouvriez émouvraient émeuve émeuves ému émue émus0 "
                "émues émouvant",
    "envoyer": "envoie envoies envoyons envoyez envoient envoyais "
               "envoyait envoyions envoyiez envoyaient envoyai envoyas envoya "
               "envoyâtes "
               "envoyâmes envoyèrent enverrai enverras enverra "
               "enverrons enverrez enverront enverrais enverrait "
               "enverrions enverriez enverraient envoyé envoyée "
               "envoyés envoyées envoyant",
}

# common nouns (plural generated by rule)
NOUNS = """
maison porte fenêtre table chaise lit mur toit chambre cuisine salle
jardin arbre fleur feuille branche racine herbe forêt champ montagne
colline vallée rivière lac mer océan plage sable pierre rocher terre
ciel nuage pluie neige vent orage éclair tonnerre soleil lune étoile
monde pays ville village rue route chemin pont place marché magasin
boutique école université bibliothèque musée théâtre cinéma église
hôpital gare aéroport bureau usine ferme château tour prison
homme femme enfant fille garçon bébé personne gens ami amie voisin
famille père mère fils frère soeur oncle tante cousin grand-père
mari épouse parent
tête visage oeil nez bouche oreille cheveu front joue menton cou
épaule bras main doigt ongle poitrine dos ventre jambe genou pied
coeur sang peau os muscle cerveau voix
chien chat cheval vache mouton chèvre cochon poule coq canard oie
lapin souris rat loup renard ours cerf sanglier oiseau aigle corbeau
pigeon moineau poisson truite saumon requin baleine dauphin serpent
lézard grenouille insecte abeille mouche moustique fourmi araignée
papillon escargot
pain beurre fromage lait oeuf viande poulet boeuf porc jambon poisson0
légume pomme poire pêche prune cerise fraise framboise raisin orange
citron banane tomate carotte pomme-de-terre0 oignon ail salade chou
haricot pois champignon riz pâte soupe sauce sel poivre sucre miel
confiture gâteau tarte biscuit chocolat café thé vin bière eau jus
repas déjeuner dîner goûter
jour nuit matin soir après-midi0 semaine mois année siècle heure
minute seconde moment instant époque saison printemps été automne
hiver date anniversaire fête vacance
travail métier emploi salaire argent prix coût impôt banque compte
carte billet monnaie pièce achat vente commerce affaire entreprise
société usine0 machine outil marteau clou vis scie pelle
livre page papier lettre mot phrase texte histoire roman poème
journal revue article nouvelle image photo dessin peinture tableau
musique chanson danse film pièce0 jeu jouet balle ballon carte0
téléphone ordinateur écran clavier souris0 fichier dossier donnée
réseau site courriel message code programme logiciel système serveur
langue langage parole discours question réponse idée pensée raison
esprit âme mémoire souvenir rêve espoir peur joie tristesse colère
amour haine bonheur malheur plaisir douleur douceur force faiblesse
courage honte fierté honneur vérité mensonge secret silence bruit
guerre paix armée soldat arme bataille victoire défaite ennemi
gouvernement état loi droit justice juge avocat police crime voleur
prison0 liberté égalité nation peuple roi reine prince princesse
empereur président ministre député maire citoyen
science nature vie mort naissance santé maladie médecin infirmier
remède médicament fièvre douleur0 accident blessure
voiture train avion bateau vélo moto bus camion roue moteur essence
voyage départ arrivée retour chemin0 carte1 valise sac bagage billet0
vêtement robe jupe pantalon chemise veste manteau chapeau chaussure
chaussette gant écharpe ceinture bouton poche tissu laine coton soie
couleur forme taille poids mesure nombre chiffre calcul somme moitié
quart tiers double centaine millier million milliard
feu flamme fumée cendre charbon bois fer or argent0 cuivre plomb
acier verre plastique papier0 carton cuir
bout côté coin bord centre milieu fond surface hauteur largeur
longueur profondeur distance espace lieu endroit position direction
nord sud est0 ouest gauche droite haut bas avant arrière dessus
dessous intérieur extérieur entrée sortie passage escalier étage
cave grenier couloir balcon terrasse cour
cadeau surprise chance malchance hasard destin sort aventure danger
risque problème solution erreur faute défaut qualité avantage
inconvénient différence ressemblance exemple modèle façon manière
moyen but objectif résultat conséquence cause effet raison0 preuve
détail ensemble partie groupe équipe membre chef patron client
visiteur invité hôte étranger inconnu témoin victime héros
bateau0 voile rame filet pêche chasse fusil flèche arc cible
cheval0 selle écurie grange champ0 récolte blé maïs avoine orge
graine semence moisson vendange vigne
journal0 radio télévision publicité annonce émission chaîne
sport match course saut lancer0 natation ski tennis football rugby
basket victoire0 champion championnat médaille record
bureau0 chaise0 lampe tiroir étagère armoire miroir horloge montre
réveil clé serrure poignée rideau tapis coussin couverture drap
oreiller savon serviette brosse peigne rasoir parfum
cuisine0 four fourneau casserole poêle assiette bol verre0 tasse
couteau fourchette cuillère plateau nappe bouteille bouchon panier
boîte sac0 paquet caisse tonneau seau bassine éponge balai
pays0 frontière région province département commune quartier
banlieue capitale port île péninsule continent désert plaine
plateau0 falaise grotte source0 ruisseau torrent cascade étang marais
côte0 rivage golfe baie cap détroit canal écluse barrage digue
neige0 gel givre brouillard brume rosée averse grêle tempête ouragan
tornade canicule sécheresse inondation avalanche séisme éruption
oiseau0 hirondelle rossignol alouette mésange merle grive perdrix
faisan caille héron cigogne mouette goéland albatros pingouin autruche
perroquet perruche hibou chouette vautour faucon épervier
insecte0 guêpe frelon bourdon libellule sauterelle criquet cigale
scarabée coccinelle chenille cocon ruche essaim fourmilière
arbre0 chêne hêtre frêne orme bouleau peuplier saule tilleul érable
platane marronnier sapin pin cèdre cyprès olivier figuier pommier
poirier cerisier prunier amandier noyer châtaignier vignoble verger
racine0 tronc écorce branche0 rameau bourgeon pétale tige épine
mousse fougère roseau jonc lierre ronce buisson haie taillis clairière
outil0 pince tenaille lime râpe rabot ciseau perceuse tournevis
échelle échafaudage brouette truelle pioche hache faux faucille fléau
charrue herse semoir moulin meule pressoir forge enclume soufflet
métier0 tisserand forgeron menuisier charpentier maçon plombier
électricien boulanger boucher0 épicier pharmacien libraire horloger
cordonnier tailleur couturier coiffeur jardinier berger vacher
pêcheur chasseur bûcheron mineur marin matelot capitaine pilote
facteur douanier pompier policier gendarme notaire greffier huissier
corps0 squelette crâne mâchoire vertèbre côte1 bassin fémur tibia
cheville orteil talon paume poignet coude aisselle nuque tempe
sourcil cil paupière narine lèvre langue0 dent gencive palais0 gorge
poumon foie rein estomac intestin vessie artère veine nerf tendon
meuble canapé fauteuil tabouret banc commode buffet vaisselier
secrétaire0 pupitre berceau hamac paillasse matelas sommier traversin
édredon housse taie tenture store volet persienne gouttière cheminée
poutre plafond plancher carrelage parquet moquette papier-peint0
lustre applique bougie chandelier lanterne torche flambeau
""".split()

# adjectives (feminine + plurals generated by rule)
ADJECTIVES = """
grand petit bon mauvais beau joli laid jeune vieux nouveau ancien
premier dernier seul autre même tel quel certain différent divers
haut bas long court large étroit gros mince épais fin léger lourd
fort faible dur mou doux rude lisse rugueux droit courbe rond carré
plat creux plein vide ouvert fermé libre occupé
chaud froid tiède frais sec humide mouillé propre sale pur
clair sombre obscur brillant pâle vif foncé blanc noir rouge bleu
vert jaune gris brun rose violet orange0 blond roux
riche pauvre cher gratuit précieux utile inutile nécessaire possible
impossible facile difficile simple compliqué commun rare ordinaire
extraordinaire normal étrange bizarre curieux célèbre connu inconnu
important grave sérieux drôle amusant ennuyeux intéressant
heureux malheureux content triste gai joyeux inquiet calme tranquille
nerveux furieux fâché surpris étonné effrayé fier honteux jaloux
gentil méchant aimable poli impoli cruel tendre sensible dur0
honnête malhonnête juste injuste fidèle sincère franc menteur
courageux lâche prudent imprudent sage fou raisonnable
intelligent bête stupide habile maladroit capable incapable savant
ignorant attentif distrait curieux0 actif passif paresseux
travailleur créateur conservateur observateur vivant mort0 vrai faux réel imaginaire naturel artificiel
humain animal0 végétal minéral physique chimique électrique
national international régional local étranger0 public privé
social politique économique religieux militaire civil royal
général particulier principal secondaire central
entier complet incomplet total partiel égal inégal supérieur
inférieur majeur mineur maximal minimal moyen unique double triple
rapide lent vite0 soudain brusque immédiat futur présent passé
prochain précédent suivant actuel moderne antique éternel
jeune0 âgé adulte enfantin féminin masculin
malade sain sauf blessé fatigué épuisé reposé affamé assoiffé
aveugle sourd muet boiteux chauve barbu
proche lointain voisin0 absent présent0 visible invisible
profond superficiel immense énorme vaste minuscule géant nain
nombreux innombrable suffisant insuffisant abondant
délicieux savoureux amer acide sucré salé épicé fade
agréable désagréable charmant séduisant élégant gracieux vulgaire
magnifique splendide superbe merveilleux horrible affreux terrible
effroyable épouvantable admirable remarquable formidable
solide fragile robuste résistant souple rigide flexible élastique
tendu détendu serré desserré noué dénoué tordu droit0
pointu tranchant émoussé aigu obtus arrondi anguleux
transparent opaque translucide limpide trouble0 clair0
bruyant silencieux sonore assourdissant mélodieux discordant
parfumé odorant inodore puant nauséabond
soyeux rêche doux0 velouté pelucheux
lumineux éclatant étincelant scintillant terne mat brillant0
humide0 trempé détrempé imbibé desséché aride
fertile stérile fécond infertile cultivé inculte sauvage domestique
apprivoisé farouche craintif hardi téméraire audacieux intrépide
peureux froussard courageux0 vaillant héroïque
généreux avare économe dépensier prodigue cupide désintéressé
modeste vaniteux orgueilleux prétentieux humble arrogant insolent
respectueux irrespectueux obéissant désobéissant docile rebelle
soumis indompté
""".split()

# standalone adverbs (on top of the -ment derivation)
ADVERBS = """
hier aujourd'hui demain maintenant bientôt tard tôt toujours jamais
souvent parfois quelquefois rarement déjà encore enfin ensuite puis
d'abord après avant pendant longtemps aussitôt soudain tantôt
ici là ailleurs partout nulle-part dedans dehors dessus0 dessous0
devant derrière loin près autour
beaucoup peu assez trop tant autant plus0 moins presque environ
à-peine davantage tellement si0 aussi0 très0 fort0 bien0 mal mieux
pis ainsi ensemble0 exprès plutôt surtout seulement même0 certes
oui non peut-être sans-doute vraiment
""".split()


# --------------------------------------------------------------------- #
# inflection rules (textbook French morphology)
# --------------------------------------------------------------------- #


def _strip_marker(lemma: str) -> str:
    """Lemma lists disambiguate duplicates with a trailing digit."""
    return lemma.rstrip("0123456789")


def conjugate_er(inf: str) -> set[str]:
    """All simple-tense forms of a regular 1st-group verb, with the
    -ger/-cer (e/ç before a,o), -yer (y→i before mute e) and è-type
    (acheter/appeler/préférer families, flagged 1/2/3) adjustments."""
    family = 0
    if inf and inf[-1].isdigit():
        family = int(inf[-1])
        inf = _strip_marker(inf)
    stem = inf[:-2]

    def base(ending: str) -> str:
        s = stem
        if ending[:1] in "aoâ":
            if inf.endswith("ger"):
                s = stem + "e"
            elif inf.endswith("cer"):
                s = stem[:-1] + "ç"
        return s + ending

    def mute(ending: str) -> str:
        # stem used before a mute e (je parle / j'achète / j'appelle)
        s = stem
        if inf.endswith(("oyer", "uyer", "ayer")):
            s = stem[:-1] + "i"
        elif family == 1:  # acheter → achète (last e of stem → è)
            i = max(stem.rfind("e"), stem.rfind("é"))
            if i >= 0:  # a mis-flagged e-less stem must not corrupt
                s = stem[:i] + "è" + stem[i + 1 :]
        elif family == 2:  # appeler → appelle (double the consonant)
            s = stem + stem[-1]
        elif family == 3:  # préférer → préfère (last é → è)
            i = stem.rfind("é")
            if i >= 0:
                s = stem[:i] + "è" + stem[i + 1 :]
        return s + ending

    fut_stem = {1: mute(""), 2: mute("")}.get(family, stem)
    if inf.endswith(("oyer", "uyer", "ayer")):
        fut_stem = mute("")
    forms = set()
    for e in ("e", "es", "ent"):  # present/subjunctive mute endings
        forms.add(mute(e))
    for e in ("ons", "ez", "ions", "iez"):
        forms.add(base(e))
    for e in ("ais", "ais", "ait", "ions", "iez", "aient"):  # imparfait
        forms.add(base(e))
    for e in ("ai", "as", "a", "âmes", "âtes", "èrent"):  # passé simple
        forms.add(base(e))
    for e in ("ai", "as", "a", "ons", "ez", "ont"):  # futur
        forms.add(fut_stem + "er" + e)
    for e in ("ais", "ais", "ait", "ions", "iez", "aient"):  # cond.
        forms.add(fut_stem + "er" + e)
    forms.add(base("ant"))  # participe présent
    for e in ("é", "ée", "és", "ées"):  # participe passé
        forms.add(base(e))
    forms.add(inf)
    return forms


def conjugate_ir2(inf: str) -> set[str]:
    """2nd group (finir type: -iss- infix)."""
    inf = _strip_marker(inf)
    stem = inf[:-2]
    forms = {inf}
    for e in ("is", "is", "it", "issons", "issez", "issent"):
        forms.add(stem + e)
    for e in ("issais", "issait", "issions", "issiez", "issaient"):
        forms.add(stem + e)
    for e in ("is", "it", "îmes", "îtes", "irent"):
        forms.add(stem + e)
    for e in ("ai", "as", "a", "ons", "ez", "ont"):
        forms.add(inf + e)  # futur: finirai
    for e in ("ais", "ait", "ions", "iez", "aient"):
        forms.add(inf + e)  # conditionnel
    for e in ("isse", "isses", "issions", "issiez", "issent"):
        forms.add(stem + e)  # subjonctif
    forms.add(stem + "issant")
    for e in ("i", "ie", "is", "ies"):
        forms.add(stem + e)  # participe passé
    return forms


def conjugate_re(inf: str) -> set[str]:
    """3rd group regular -re (vendre type)."""
    inf = _strip_marker(inf)
    root = inf[:-2]  # vend (inf minus 're'; futur stem is inf minus 'e')
    forms = {inf}
    for e in ("s", "s", "", "ons", "ez", "ent"):
        forms.add(root + e)
    for e in ("ais", "ait", "ions", "iez", "aient"):
        forms.add(root + e)
    for e in ("is", "it", "îmes", "îtes", "irent"):
        forms.add(root + e)
    for e in ("ai", "as", "a", "ons", "ez", "ont"):
        forms.add(inf[:-1] + e)  # vendrai
    for e in ("ais", "ait", "ions", "iez", "aient"):
        forms.add(inf[:-1] + e)  # vendrais
    for e in ("e", "es", "ions", "iez", "ent"):
        forms.add(root + e)  # subjonctif
    forms.add(root + "ant")
    for e in ("u", "ue", "us", "ues"):
        forms.add(root + e)
    return forms


_AL_PLURAL_EXCEPTIONS = {"bal", "carnaval", "festival", "chacal", "récital"}

# the seven -ou nouns whose plural takes -x (bijoux, choux, genoux…)
_OU_X_PLURALS = {"bijou", "caillou", "chou", "genou", "hibou", "joujou", "pou"}


def conjugate_uire(inf: str) -> set[str]:
    """3rd-group -uire family (conduire type: -uis/-uisons, pp -uit;
    nuire/luire take the bare -ui participle)."""
    stem = inf[:-3]  # condu
    forms = {inf}
    for e in ("is", "is", "it", "isons", "isez", "isent"):
        forms.add(stem + e)
    for e in ("isais", "isait", "isions", "isiez", "isaient"):
        forms.add(stem + e)
    for e in ("isis", "isit", "isîmes", "isîtes", "isirent"):
        forms.add(stem + e)
    for e in ("irai", "iras", "ira", "irons", "irez", "iront",
              "irais", "irait", "irions", "iriez", "iraient"):
        forms.add(stem + e)
    for e in ("ise", "ises", "isent"):
        forms.add(stem + e)
    forms.add(stem + "isant")
    if inf in ("nuire", "luire", "reluire"):
        forms.add(stem + "i")
    else:
        for e in ("it", "ite", "its", "ites"):
            forms.add(stem + e)
    return forms


def conjugate_indre(inf: str) -> set[str]:
    """3rd-group -aindre/-eindre/-oindre family (craindre type:
    -ns/-nt singular, -gn- plural stem, pp in -nt)."""
    stem = inf[:-3]  # crain / pein / join
    gn = stem[:-1] + "gn"  # craign
    forms = {inf, stem + "s", stem + "t"}
    for e in ("ons", "ez", "ent", "ais", "ait", "ions", "iez", "aient",
              "is", "it", "îmes", "îtes", "irent", "e", "es", "ant"):
        forms.add(gn + e)
    for e in ("ai", "as", "a", "ons", "ez", "ont",
              "ais", "ait", "ions", "iez", "aient"):
        forms.add(inf[:-1] + e)  # craindr+ai — the stem keeps inf's 'r'
    for e in ("te", "ts", "tes"):
        forms.add(stem + e)  # crainte craints craintes (pp masc = 3sg)
    return forms


# -uire / -indre inventories (families above)
VERBS_UIRE = """
conduire reconduire traduire construire reconstruire détruire produire
reproduire introduire réduire séduire déduire enduire induire instruire
cuire recuire nuire luire reluire
""".split()

VERBS_INDRE = """
craindre plaindre contraindre peindre dépeindre repeindre éteindre
atteindre enfreindre feindre geindre teindre déteindre étreindre
restreindre empreindre joindre rejoindre adjoindre disjoindre enjoindre
""".split()


def pluralize(word: str) -> str:
    """Noun/adjective plural by the standard rules."""
    if word[-1] in "sxz":
        return word
    if word.endswith(("eau", "au", "eu")):
        return word + "x"
    if word in _OU_X_PLURALS:
        return word + "x"
    if word.endswith("al") and word not in _AL_PLURAL_EXCEPTIONS:
        return word[:-2] + "aux"
    return word + "s"


def feminize(adj: str) -> str:
    """Adjective feminine by the standard rules."""
    if adj.endswith("e"):
        return adj
    if adj.endswith("eux"):
        return adj[:-3] + "euse"
    if adj.endswith("ateur"):
        return adj[:-4] + "trice"
    if adj.endswith("eur") and adj not in ("majeur", "mineur", "supérieur",
                                           "inférieur", "antérieur"):
        return adj[:-3] + "euse"
    if adj.endswith("f"):
        return adj[:-1] + "ve"
    if adj.endswith("er"):
        return adj[:-2] + "ère"
    if adj.endswith("et"):
        if adj in ("complet", "incomplet", "concret", "discret",
                   "secret", "inquiet"):
            return adj[:-2] + "ète"
        return adj + "te"
    if adj.endswith(("el", "eil", "en", "on")):
        return adj + adj[-1] + "e"
    if adj.endswith("c"):
        return adj[:-1] + "che"
    if adj.endswith("x"):
        return adj[:-1] + "se"
    return adj + "e"


_IRREGULAR_FEM = {
    "beau": "belle", "nouveau": "nouvelle", "vieux": "vieille",
    "fou": "folle", "mou": "molle", "blanc": "blanche",
    "franc": "franche", "sec": "sèche", "frais": "fraîche",
    "long": "longue", "gentil": "gentille", "faux": "fausse",
    "roux": "rousse", "doux": "douce", "gros": "grosse",
    "bas": "basse", "épais": "épaisse", "gras": "grasse",
    "favori": "favorite", "public": "publique", "grec": "grecque",
    "nul": "nulle", "bénin": "bénigne", "malin": "maligne",
    "aigu": "aiguë",
}


# The closed -amment/-emment adverb inventory (dictionary-attested;
# the series stopped being productive centuries ago). An -ant/-ent
# adjective derives its adverb ONLY if the result is listed here.
_MENT_CLOSED = frozenset("""
abondamment arrogamment brillamment bruyamment complaisamment
constamment couramment galamment ignoramment incessamment
indépendamment instamment insuffisamment méchamment nonchalamment
obligeamment pesamment plaisamment précipitamment puissamment
savamment suffisamment vaillamment élégamment étonnamment
apparemment ardemment concurremment consciemment décemment
différemment diligemment dolemment excellemment fréquemment
impatiemment impertinemment imprudemment incidemment inconsciemment
indifféremment indolemment innocemment insolemment intelligemment
négligemment opulemment patiemment pertinemment précédemment
prudemment récemment truculemment turbulemment urgemment violemment
véhémemment éloquemment éminemment évidemment
""".split())

# -ent adjectives whose adverb is the REGULAR feminine + -ment
# (outside the -emment series): lent → lentement, présent → présentement
_ENT_REGULAR_ADV = frozenset({"lent", "présent"})

# Lexicalized adverbs the mechanical rules misspell: the -ément accent
# shift (profond → profondément, NOT *profondement), the traditional
# -ûment circumflex series, and true irregulars (gentiment, mollement).
_ADV_LEXICALIZED = {
    "gentil": "gentiment", "mou": "mollement", "fou": "follement",
    "bref": "brièvement", "traître": "traîtreusement",
    "profond": "profondément", "précis": "précisément",
    "intense": "intensément", "immense": "immensément",
    "énorme": "énormément", "aveugle": "aveuglément",
    "commode": "commodément", "incommode": "incommodément",
    "conforme": "conformément", "uniforme": "uniformément",
    "commun": "communément", "confus": "confusément",
    "diffus": "diffusément", "obscur": "obscurément",
    "exprès": "expressément", "opportun": "opportunément",
    "importun": "importunément", "exquis": "exquisément",
    "assidu": "assidûment", "continu": "continûment",
    "goulu": "goulûment", "cru": "crûment",
    "congru": "congrûment", "incongru": "incongrûment",
    "impuni": "impunément", "profus": "profusément",
    "gai": "gaiement",
}

# Adjectives whose -ment adverb is ATTESTED (fortement, heureusement,
# doucement…). Derivation is allowlist-only: the rule "feminine +
# -ment" is formally regular but lexically closed — most technical,
# gentile, color, and participial adjectives have NO adverb
# (*comestiblement, *libyennement, *bleument, *caramélisément), so a
# blanket rule fabricates hundreds of non-words. Masc-vowel-final
# entries (vrai, joli, désolé…) take masculine + ment.
_ADV_ALLOW = frozenset("""
abusif actif actuel admirable adorable adroit affectueux agile
agressif agréable aimable amer amical ample anatomique ancien annuel
anonyme astucieux atroce attentif audacieux authentique automatique
banal bas bizarre bon brutal calme candide certain chaleureux
charitable chaud chimique chronique clair clandestin classique
comique complet confortable considérable convenable convulsif
cordial courageux courtois craintif cruel crédule cupide curieux
difforme digne diplomatique distrait docile doux dramatique dur
débonnaire définitif délicieux démocratique déplorable dévot
effroyable emphatique enfantin entier exact excessif expéditif
extraordinaire facile faible fameux familier fatal fautif faux
fertile fier fin fiévreux flegmatique fort fougueux fragile frais
franc froid frugal frénétique funeste furieux furtif futile fécond
féodal glacial global glorieux gracieux graduel grand grave grivois
grossier général généreux habile habituel hardi haut hautain heureux
honnête honorable honteux horizontal horrible hostile humain humide
hâtif héroïque identique illégal immobile impeccable impulsif
impérial impétueux incroyable infaillible infime infini inlassable
innombrable inquiet instinctif intempestif intime intrépide intuitif
inutile invisible inégal inévitable irréprochable jaloux joli jovial
joyeux judicieux juste large latéral lent libre limpide lisible
littéral lointain long loyal lucide luxueux légal léger légitime
machinal majestueux maladif maladroit malheureux malhonnête
malicieux malin manuel massif mensuel merveilleux minutieux modeste
muet musical mystérieux méticuleux narquois naturel naïf nerveux net
normal notable nul négatif objectif occasionnel officiel ordinaire
orgueilleux original paisible paresseux particulier partiel passif
pauvre païen pensif perfide perpétuel personnel petit peureux
pittoresque placide plaintif plantureux plein poli politique
ponctuel positif preste primitif principal probable prochain
professionnel prompt propre précieux précoce public pudique puéril
quotidien radical raisonnable rapide rare rationnel redoutable
relatif religieux remarquable respectueux riche rigide rigoureux
robuste romanesque rond royal rude rural rustique réel régulier
résolu sage sain sauvage savoureux sceptique sec sensible seul
significatif silencieux simple sincère sociable social soigneux
solennel solide solitaire sombre somptueux soudain souple sournois
splendide sportif spécial stoïque stratégique studieux stupide
stérile suave subit subjectif subtil successif symbolique séculaire
sérieux tardif tendre terrible textuel théorique théâtral timide
total traditionnel tragique tranquille triste téméraire ultime
unanime unique universel usuel utile vain vaste verbal vertical vif
vigoureux vindicatif visible vital vrai véritable âpre économique
égal électrique énergique épais éternel étourdi étrange étroit
évasif éventuel
""".split())


def build_lexicon() -> dict[str, tuple[int, str | None, str | None]]:
    """Generate the full lexicon: ``graph → (tag, orth, lemma)``.

    Insertion priority (first writer wins — one entry per graph, like
    the reference's word.csv): nouns, adjectives, adverbs, then verbs —
    so noun/verb homographs (porte, livre) keep the substantive reading,
    matching the compact lexicon's choices.
    """
    out: dict[str, tuple[int, str | None, str | None]] = {}

    def put(graph: str, tag: int, lemma: str) -> None:
        out.setdefault(graph, (tag, None, lemma))

    for n in (NOUNS + X.NOUNS_EXT + X.NOUNS_THEMATIC + X.NOUNS_DERIVED + X.NOUNS_HOMOGRAPH
              + Y.NOUNS_BATCH + Y.NOUNS_BATCH_B + Y.NOUNS_BATCH_C
              + Z.NOUNS_BOTANY + Z.NOUNS_ZOOLOGY + Z.NOUNS_MEDICINE
              + Z.NOUNS_LAW + Z.NOUNS_MARITIME + Z.NOUNS_ARCHITECTURE
              + Z.NOUNS_RELIGION + Z.NOUNS_GEOLOGY + Z.NOUNS_TEXTILES
              + Z.NOUNS_MUSIC + Z.NOUNS_GASTRONOMY + Z.NOUNS_MILITARY
              + Z.NOUNS_ABSTRACT + Z.NOUNS_TRADES + Z.NOUNS_SCIENCES
              + Z.NOUNS_SCHOOL + Z.NOUNS_FARM + Z.NOUNS_SKY
              + Z.NOUNS_CITY + Z.NOUNS_SOCIAL + Z.NOUNS_CHEMISTRY
              + Z.NOUNS_OBJECTS + Z.NOUNS_RHETORIC + Z.NOUNS_TAIL
              + Z.NOUNS_TAIL2 + Z.NOUNS_TAIL3):
        n = _strip_marker(n)
        put(n, D.SUB, n)
        put(pluralize(n), D.SUB, n)

    # near-exceptionless nominalizations of the derivational verb
    # families: -iser → -isation, -ifier → -ification (réaliser →
    # réalisation, amplifier → amplification). "Near": the handful of
    # -iser verbs whose noun is suppletive (agonie, exorcisme) or
    # nonexistent are excluded rather than fabricated.
    non_deriving = {
        "agoniser", "braiser", "exorciser", "toiser", "prophétiser",
        "tyranniser",
    }
    for v in X.VERBS_ER_ISER.split() + [
        w for w in Y.VERBS_ER_MODERN
        if _strip_marker(w).endswith(("iser", "ifier"))
        and _strip_marker(w) not in non_deriving
    ]:
        v = _strip_marker(v)
        if v.endswith("iser"):
            n = v[:-4] + "isation"
        elif v.endswith("ifier"):
            n = v[:-5] + "ification"
        else:
            continue
        put(n, D.SUB, n)
        put(pluralize(n), D.SUB, n)

    for a in (ADJECTIVES + X.ADJECTIVES_EXT + X.ADJECTIVES_THEMATIC + Y.ADJS_BATCH
              + Y.ADJS_BATCH_B + Z.ADJS_QUALITY + Z.ADJS_PHYSICAL
              + Z.ADJS_TECHNICAL + Z.ADJS_GENTILE + Z.ADJS_ABLE
              + Z.ADJS_IF_AL + Z.ADJS_COLOR_STATE):
        a = _strip_marker(a)
        fem = _IRREGULAR_FEM.get(a, feminize(a))
        put(a, D.ADJ, a)
        put(fem, D.ADJ, a)
        put(pluralize(a), D.ADJ, a)
        put(pluralize(fem), D.ADJ, a)
        # -ment adverb derivation — every path is gated on an attested
        # inventory, because each formal rule is lexically closed (see
        # _ADV_ALLOW / _MENT_CLOSED / _ADV_LEXICALIZED): the
        # lexicalized map first (the mechanical rules would misspell
        # profondément, gentiment, assidûment, gaiement), then the
        # closed -amment/-emment series, then attested fem/masc+ment.
        if a in _ADV_LEXICALIZED:
            adv = _ADV_LEXICALIZED[a]
        elif a in _ENT_REGULAR_ADV:  # lentement, présentement
            adv = fem + "ment"
        elif a.endswith(("ant", "ent")):
            adv = a[:-3] + ("amment" if a.endswith("ant") else "emment")
            if adv not in _MENT_CLOSED:
                adv = ""
        elif a in _ADV_ALLOW:
            adv = a + "ment" if a[-1] in "aeiouéû" else fem + "ment"
        else:
            adv = ""
        if len(adv) > 6:
            put(adv, D.ADV, adv)

    # the closed -amment/-emment inventory and the lexicalized map are
    # attested adverbs in their own right — register them directly so
    # they do not depend on their base adjective being inventoried
    # (couramment must exist whether or not "courant" is an entry)
    for adv in _MENT_CLOSED:
        put(adv, D.ADV, adv)
    for adv in _ADV_LEXICALIZED.values():
        put(adv, D.ADV, adv)

    for adv in ADVERBS + Z.ADVERBS_EXT2:
        adv = _strip_marker(adv).replace("-", " ")
        put(adv, D.ADV, adv)

    for v in (VERBS_ER + X.VERBS_ER_EXT + X.VERBS_ER_THEMATIC + X.VERBS_ER_FINAL
              + Y.VERBS_ER_CRAFT + Y.VERBS_ER_COOKING + Y.VERBS_ER_OUTDOORS
              + Y.VERBS_ER_BODY + Y.VERBS_ER_SOUNDS + Y.VERBS_ER_MOVEMENT
              + Y.VERBS_ER_CIVIC + Y.VERBS_ER_EVERYDAY + Y.VERBS_ER_SOCIETY
              + Y.VERBS_ER_MODERN + Y.VERBS_ER_LAST + Y.VERBS_ER_FINAL2
              + Z.VERBS_ER_LITERARY + Z.VERBS_ER_NATURE + Z.VERBS_ER_HOUSE
              + Z.VERBS_ER_EXPRESSIVE):
        lemma = _strip_marker(v)
        if lemma in ("aller", "envoyer", "renvoyer"):  # true irregulars
            continue
        for f in conjugate_er(v):
            put(_strip_marker(f), D.VERB, lemma)
    for v in (VERBS_IR2 + X.VERBS_IR2_EXT + X.VERBS_IR2_THEMATIC
              + X.VERBS_IR2_FINAL + Y.VERBS_IR2_BATCH + Z.VERBS_IR2_BATCH2):
        lemma = _strip_marker(v)
        for f in conjugate_ir2(v):
            put(_strip_marker(f), D.VERB, lemma)
    for v in VERBS_RE + X.VERBS_RE_EXT:
        lemma = _strip_marker(v)
        for f in conjugate_re(v):
            put(_strip_marker(f), D.VERB, lemma)
    for v in VERBS_UIRE:
        for f in conjugate_uire(v):
            put(f, D.VERB, v)
    for v in VERBS_INDRE:
        for f in conjugate_indre(v):
            put(f, D.VERB, v)
    for lemma, forms in VERBS_IRREGULAR.items():
        put(lemma, D.VERB, lemma)
        for f in forms.split():
            put(_strip_marker(f), D.VERB, lemma)
    # prefix derivatives share the base paradigm: the derived form is
    # prefix + (base form minus the base paradigm's own leading chars),
    # e.g. revenir: re+viens, comprendre: com+prends, découvrir:
    # dé+couv+(ouvert−ouv), décrire: dé+(écris−é)
    for prefix, model, model_skip, lemma in (
        ("re", "venir", 0, "revenir"), ("de", "venir", 0, "devenir"),
        ("sou", "tenir", 0, "soutenir"), ("ob", "tenir", 0, "obtenir"),
        ("main", "tenir", 0, "maintenir"),
        ("com", "prendre", 0, "comprendre"),
        ("ap", "prendre", 0, "apprendre"),
        ("sur", "prendre", 0, "surprendre"),
        ("re", "prendre", 0, "reprendre"),
        ("per", "mettre", 0, "permettre"), ("pro", "mettre", 0, "promettre"),
        ("ad", "mettre", 0, "admettre"), ("re", "mettre", 0, "remettre"),
        ("re", "connaître", 0, "reconnaître"),
        # ouvrir-type: forms start with the 'ouv' stem — swap it out
        ("découv", "ouvrir", 3, "découvrir"),
        ("couv", "ouvrir", 3, "couvrir"),
        ("off", "ouvrir", 3, "offrir"), ("souff", "ouvrir", 3, "souffrir"),
        ("re", "lire", 0, "relire"), ("é", "lire", 0, "élire"),
        ("re", "voir", 0, "revoir"), ("pré", "voir", 0, "prévoir"),
        ("par", "courir", 0, "parcourir"), ("se", "courir", 0, "secourir"),
        ("sou", "rire", 0, "sourire"),
        ("res", "sentir", 0, "ressentir"), ("con", "sentir", 0, "consentir"),
        ("re", "partir", 0, "repartir"), ("res", "sortir", 0, "ressortir"),
        ("dé", "faire", 0, "défaire"), ("re", "faire", 0, "refaire"),
        ("satis", "faire", 0, "satisfaire"),
        ("pré", "dire", 0, "prédire"), ("inter", "dire", 0, "interdire"),
        ("dé", "écrire", 1, "décrire"), ("ins", "écrire", 1, "inscrire"),
        ("pres", "écrire", 1, "prescrire"),
        # round-5: paraître family shares connaître's paradigm minus
        # the 'conn' stem; recevoir's derivatives swap the 're' prefix
        ("par", "connaître", 4, "paraître"),
        ("appar", "connaître", 4, "apparaître"),
        ("dispar", "connaître", 4, "disparaître"),
        ("a", "battre", 0, "abattre"), ("com", "battre", 0, "combattre"),
        ("dé", "battre", 0, "débattre"),
        ("ac", "cueillir", 0, "accueillir"),
        ("re", "cueillir", 0, "recueillir"),
        ("aper", "recevoir", 2, "apercevoir"),
        ("per", "recevoir", 2, "percevoir"),
        ("con", "recevoir", 2, "concevoir"),
        ("dé", "recevoir", 2, "décevoir"),
        ("pour", "suivre", 0, "poursuivre"),
        ("r", "envoyer", 0, "renvoyer"),
        ("en", "fuir", 0, "enfuir"),
        ("prom", "émouvoir", 2, "promouvoir"),
    ):
        for f in VERBS_IRREGULAR[model].split():
            put(prefix + _strip_marker(f)[model_skip:], D.VERB, lemma)
        put(lemma, D.VERB, lemma)

    return out


def merged_lexicon() -> dict[str, tuple[int, str | None, str | None]]:
    """The generated lexicon with the curated compact entries (function
    words, frequent irregular readings) taking priority — the merge the
    ``fr_analysis`` query ships to executors as one broadcast."""
    lex = build_lexicon()
    lex.update(D.WORDS)
    return lex


def write_lexicon_csv(path: str) -> int:
    """Dump as GRAPH,TAG,ORTH,LEM — the reference word.csv shape, so the
    ``load_lexicon_csv`` loader round-trips it. Returns the entry count."""
    import csv

    tag_names = {
        D.VERB: "VERB", D.SUB: "SUB", D.NAME: "NAME", D.ADJ: "ADJ",
        D.ADV: "ADV", D.DET: "DET", D.PRO: "PRO", D.CONJ: "CONJ",
        D.PREP: "PREP", D.NUM: "NUM", D.EXCL: "EXCL",
    }
    lex = build_lexicon()
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        for graph in sorted(lex):
            tag, orth, lem = lex[graph]
            w.writerow([graph, tag_names.get(tag, ""), orth or "", lem or ""])
    return len(lex)
