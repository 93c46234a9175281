"""Round-6 lexicon extension: the push from ~90k toward the reference's
~130k-type scale (``/root/reference/java/alix/lucene/analysis/FrDics.java:82-83``).

Same authoring model as :mod:`fr_lexicon2` (public-knowledge vocabulary,
expanded by the textbook inflection machinery in :mod:`fr_lexicon`; no
reference CSV content): ~700 additional 1st-group verbs grouped by
domain, ~90 second-group verbs, ~1,300 nouns (including the deverbal
homograph guards — nouns like *taille*, *solde*, *grille* that must
outrank the new verbs' mute-e forms), and ~550 adjectives. The
``-iser → -isation`` / ``-ifier → -ification`` nominalizations are
derived programmatically in ``build_lexicon`` (near-exceptionless
derivations), not listed here.

Marker conventions (shared with fr_lexicon): trailing ``1`` = è-type
mute-e stem (acheter/geler family), ``2`` = consonant-doubling
(appeler/jeter family), ``3`` = é→è stem (préférer family), ``0`` =
plain homograph/duplicate disambiguator.
"""

from __future__ import annotations

# --------------------------------------------------------------------- #
# 1st-group verbs — craft, trades, building
# --------------------------------------------------------------------- #

VERBS_ER_CRAFT = """
usiner fraiser raboter poncer limer visser dévisser clouer déclouer
agrafer dégrafer souder dessouder braser laminer estamper mouler
démouler tremper détremper boulonner déboulonner riveter2 cimenter
plâtrer replâtrer maçonner charpenter vernisser laquer émailler
tapisser carreler2 décarreler2 paver dépaver goudronner asphalter
terrasser étayer échafauder bâcher débâcher cintrer cheviller
mortaiser tenonner raboter0 chantourner affûter aiguiser émousser
meuler ébarber ciseler1 buriner graver0 estampiller
poinçonner marteler1 forger0 étirer0 tréfiler galber chromer nickeler2
étamer zinguer plomber0 vitrer mastiquer jointoyer ragréer
sabler décaper dérouiller lambrisser parqueter2 moquetter
cloisonner décloisonner isoler0 calfeutrer calfater jointer
écharner tanner0 corroyer chagriner0 empailler rempailler canner0
vanner0 tresser natter tisser détisser fouler0
carder filer0 bobiner embobiner rembobiner dévider
tricoter détricoter crocheter1 broder festonner ourler surfiler
faufiler0 plisser déplisser repasser0 amidonner
empeser1 détacher0 ravauder repriser0 rapiécer3 stopper0
""".split()

# 1st-group verbs — cooking, food, table
VERBS_ER_COOKING = """
mijoter braiser pocher0 fariner gratiner dessaler poivrer épicer
assaisonner mariner macérer3 saumurer fumer0 napper fourrer
malaxer fouetter émincer râper dénoyauter épépiner zester essorer
égoutter écumer mitonner touiller saupoudrer enrober paner
singer0 flamber0 déglacer monder émonder0
caraméliser0 meringuer beurrer débourrer0
huiler dégraisser écrémer3 cailler0 fermenter0 lever0
abaisser0 foncer0 dorer0 glacer0 givrer clarifier0
concasser piler0 tamiser bluter0 pétiller0 décanter
embouteiller décapsuler déboucher0 chambrer0 millésimer
vendanger égrapper fouler1 presser0 pressurer cuver décuver soutirer
ouiller0 coller0 filtrer0 pasteuriser0 stériliser0 lyophiliser0
surgeler1 congeler1 décongeler1 dégeler1 regeler1 réchauffer
pocher1 rissoler mitrailler0 barder0
larder entrelarder brider0 trousser0 ficeler2 déficeler2 désosser
dépecer1 détailler0 chemiser0 cercler0 ensacher
empoter0 dépoter0 conserver0 appertiser0 saler0 sécher0 boucaner
""".split()

# 1st-group verbs — sea, river, field, forest
VERBS_ER_OUTDOORS = """
amarrer appareiller accoster haler touer remorquer caboter voguer
ramer pagayer écoper caréner3 radouber gréer dégréer affréter3
arrimer désarrimer louvoyer tanguer déraper0 mouiller0 jauger
lester délester affaler hisser0 border0 choquer0 étarquer lofer
virer0 empanner gîter0 mâter démâter remâter haubaner
pavoiser draguer0 harponner0 appâter amorcer0 ferrer
épuiser0 mariner0 saurer fileter1 écailler étriper vider0
labourer herser faucher faner botteler2 engranger glaner sarcler
biner pailler dépailler fumer1 irriguer drainer greffer élaguer
émonder vendanger0 repiquer bouturer marcotter pâturer brouter
affourager ensiler moissonner0 andainer râteler1 défricher
essarter écobuer chauler marner amender0 sursemer1 ressemer1
parsemer1 égrener1 engrener1 herser0 rouler0 bâcher0
tuteurer palisser ébourgeonner effeuiller épamprer
démarier0 butter désherber sulfater traiter0 pulvériser0 poudrer0
gauler écaler écosser clôturer0
parquer transhumer agneler1 vêler pouliner
baratter affiner0 cailler1 mouler1 saler1
bûcheronner débarder ébrancher écimer étêter tronçonner0
débiter0 scier0 corder0 fagoter stérer3 écorcer
reboiser déboiser essoucher drageonner taillader inciser0 gemmer
""".split()

# 1st-group verbs — body, medicine, care
VERBS_ER_BODY = """
ausculter palper panser suturer inciser amputer vacciner inoculer
anesthésier désinfecter transfuser perfuser radiographier
diagnostiquer rechuter récidiver0 immuniser0 greffer0 implanter
inséminer accoucher0 allaiter sevrer1 emmailloter langer bercer0
moucher0 torcher débarbouiller peigner0 brosser0 natter0 boucler0
friser défriser crêper décrêper épiler raser0 savonner0 shampouiner
rincer0 talquer pommader masser0 crémer3
manucurer pédicurer maquiller démaquiller farder grimer poudrer1
parfumer embaumer momifier0 inhumer exhumer incinérer3 autopsier
disséquer3 suturer0 cautériser0 saigner0 ventouser0 purger0
vermifuger droguer0 intuber perfuser0 réanimer oxygéner3 masser1
rééduquer plâtrer0 éclisser béquiller
boiter0 boitiller claudiquer clopiner tituber chanceler2 trébucher
vaciller transpirer0 suer0 frissonner0 grelotter
claquer0 trembloter haleter1 ahaner panteler2 suffoquer0 étouffer0
tousser0 toussoter éternuer renifler0 moucher1 cracher0 crachoter
expectorer saliver baver0 mastiquer0 mâchonner mâchouiller
grignoter0 picorer béqueter2 gober0 laper lamper siroter0 lécher3
pourlécher3 sucer0 suçoter téter3 régurgiter éructer roter0
hoqueter2 bâiller0 somnoler ronfler0 rêvasser
""".split()

# 1st-group verbs — speech, sound, animal cries
VERBS_ER_SOUNDS = """
fulminer pester ronchonner bougonner maugréer grommeler2 marmonner
susurrer vociférer3 brailler beugler feuler japper miauler ronronner
meugler bêler cancaner caqueter2 glousser roucouler pépier gazouiller
croasser coasser jacasser piailler criailler brâmer0 chevroter
hululer ululer craqueter2 trisser0 craquer0
crisser grincer0 cliqueter2 ferrailler tintinnabuler tinter carillonner
sonnailler0 bourdonner0 pétarader ronronner0 cahoter
brinquebaler bringuebaler tressauter trépider vibrer0 résonner0
clapoter glouglouter gargouiller chuinter
siffloter fredonner chantonner0 entonner0 psalmodier vocaliser0
solfier moduler0 triller0 yodler scander déclamer réciter0
pérorer haranguer sermonner0 catéchiser0
apostropher interpeller héler invectiver injurier insulter0
vilipender conspuer huer0 siffler0 chahuter brocarder
railler persifler gouailler blaguer0 goguenarder ricaner0
pouffer glousser0 esclaffer0 hoqueter0 sangloter
larmoyer pleurnicher chialer crier0
hurler0 tempêter tonitruer tonner0 gronder0 grognonner rouspéter3
râler0 récriminer protester0 objecter0 rétorquer riposter répliquer0
""".split()

# 1st-group verbs — movement
VERBS_ER_MOVEMENT = """
gambader trottiner déambuler flâner vagabonder errer arpenter
crapahuter cavaler galoper trotter caracoler zigzaguer slalomer
serpenter onduler sautiller cabrioler virevolter tournoyer
pirouetter valser osciller dandiner trémousser0 pavaner0 prélasser0
gondoler0 tortiller entortiller détortiller vriller0
louvoyer0 slalomer0 dévier0 bifurquer obliquer rebrousser
rétrograder reculer0 culbuter capoter cabaner0 dégringoler
débouler dévisser0 chuter0 basculer0 verser0 renverser0 chavirer0
cahoter0 tanguer0 rouler1 glisser0 riper déraper patiner0
luger skier surfer0 planer0 voltiger papillonner0
voleter2 envoler0 percher0 jucher nicher0 dénicher
migrer émigrer immigrer transhumer0 nomadiser pérégriner
cheminer marcher1 piétiner0 talonner0 emboîter0
devancer0 distancer semer0 rattraper0 doubler0
dépasser0 croiser0 longer0 côtoyer0 frôler0 raser1 effleurer0
esquiver0 éviter0 contourner0 enjamber0 escalader0
dévaler0 sauter0
ricocher caramboler percuter heurter0
tamponner0 télescoper accrocher0 érafler0 rayer0
cabosser embosser0 froisser0 chiffonner défroisser0 déchiffonner0
""".split()

# 1st-group verbs — commerce, law, administration
VERBS_ER_CIVIC = """
marchander brader solder liquider créditer débiter encaisser
décaisser cautionner0 hypothéquer3 plaider acquitter gracier
amnistier incarcérer3 écrouer extrader inculper disculper
assermenter légiférer3 promulguer abroger amender parapher
contresigner authentifier0 légaliser0 enregistrer0 immatriculer
recenser cadastrer0 arpenter0 borner0 viabiliser0
expertiser estimer0 coter0 taxer détaxer surtaxer exonérer3
défiscaliser0 provisionner budgétiser0 comptabiliser0
auditer inventorier étiqueter0 codifier0 référencer
archiver classer0 trier0 compulser consigner0 répertorier
cataloguer ficher0 indexer0 annoter émarger parapher0 viser0
tamponner1 oblitérer3 poster0 acheminer réexpédier
dédouaner taxer0 contingenter rationner réquisitionner0
exproprier nationaliser0 municipaliser0 privatiser0 déréguler
subventionner0 indemniser défrayer rembourser0 rétribuer
appointer0 salarier mensualiser titulariser0 pérenniser
contractualiser démissionner licencier débaucher embaucher
recruter0 coopter parrainer0 pistonner rétrograder0
muter0 détacher0 déléguer0 mandater0 missionner accréditer
habiliter assermenter0 déférer3 plaider0
débouter casser1 récuser interjeter2
""".split()

# 1st-group verbs — everyday and expressive
VERBS_ER_EVERYDAY = """
bricoler rafistoler bidouiller trafiquer truquer magouiller
resquiller frauder escroquer carotter0 arnaquer flouer gruger
berner duper mystifier0 embobiner0 enjôler amadouer cajoler
dorloter choyer chouchouter materner couver0 gâter0 pouponner
câliner enlacer pelotonner lover0 nicher1
flemmarder paresser lambiner lanterner musarder baguenauder
traînasser glandouiller buller0 farnienter0 procrastiner
bûcher0 potasser plancher0 phosphorer cogiter méditer0 ruminer0
gamberger échafauder0 supputer conjecturer présumer0 subodorer
flairer0 humer deviner0 pronostiquer parier0
miser0 ponter0 gager0 risquer0 hasarder aventurer0 tenter0
essayer0 expérimenter0 tâtonner0 bidonner0 rigoler0 marrer0
bidonner1 poiler0 gondoler1 esclaffer0 pouffer0
plaisanter badiner batifoler folâtrer gambiller guincher
festoyer banqueter2 ripailler bambocher
trinquer0 picoler siffler1 pinter biberonner éponger0 cuver0
dessoûler dégriser désenivrer griser0 enivrer soûler saouler
tituber0 zigzaguer0 bringuer0
fêter0 célébrer0 commémorer inaugurer0 baptiser0 étrenner
crémailler0 pendouiller brimbaler trimbaler trimballer
coltiner charrier0 véhiculer transbahuter
""".split()

# 1st-group verbs — mind, relations, society
VERBS_ER_SOCIETY = """
fraterniser0 pactiser transiger composer0 temporiser0 atermoyer
tergiverser finasser ergoter pinailler chipoter ratiociner
chicaner épiloguer polémiquer controverser disputailler
palabrer parlementer négocier0 arbitrer0 concilier réconcilier
rabibocher raccommoder0 fâcher0 brouiller0 bouder0 snober
ostraciser0 exiler0 rapatrier expatrier
dépayser acclimater0 accoutumer habituer0 déshabituer désaccoutumer
familiariser0 apprivoiser dresser0 dompter débourrer0 mater0
juguler réfréner3 refréner3 brider1 museler2 bâillonner0
garrotter ligoter menotter entraver0 écrouer0 cloîtrer claustrer
confiner0 calfeutrer0 barricader verrouiller cadenasser
claquemurer emmurer0 murailler0 fortifier0
assiéger3 encercler cerner0 traquer pister débusquer
dénicher0 déloger0 évincer supplanter détrôner usurper0
spolier déposséder3 exproprier0 déshériter0 frustrer0 léser3
désavantager handicaper pénaliser0 sanctionner0 verbaliser0
amender0 surveiller0 épier espionner0
pister0 filer1 moucharder cafarder cafter
dénoncer0 balancer0 donner0 renier0 abjurer
apostasier parjurer0 sacrer0 consacrer0 introniser0 introniser1
exorciser anathématiser excommunier
""".split()

# 2nd-group (-ir / -issant) verbs
VERBS_IR2_BATCH = """
surenchérir aplatir arrondir assombrir affermir raffermir ramollir amollir
endurcir épaissir rétrécir embellir enlaidir appauvrir assainir
assouplir attendrir alourdir tiédir attiédir verdir brunir blêmir
resplendir reverdir refleurir moisir rancir aigrir croupir dépérir
défraîchir flétrir gauchir forcir amaigrir mincir amincir raidir
dégourdir engourdir abrutir assagir abêtir ahurir abasourdir
assortir désassortir travestir désinvestir réinvestir intervertir
pervertir asservir aguerrir équarrir meurtrir aplanir ternir
dégarnir regarnir démunir désunir impartir bannir honnir redéfinir
prémunir blottir tapir glapir vrombir mugir resurgir régir
ragaillardir repolir dépolir resalir alunir amerrir affadir
rassir roussir rosir bleuir enhardir
rembrunir renchérir amoindrir rabougrir
racornir rassortir réassortir arrondir0 ourdir bondir1 languir
alanguir avachir assoupir gravir envahir réenvahir
garantir ralentir0 anéantir aboutir0 rebondir1
retentir0 vrombir1 crépir recrépir décrépir vernir revernir
sertir dessertir enrichir0 appesantir désépaissir0
obscurcir0 noircir0 rancir0 vieillir0 rajeunir0
""".split()

# --------------------------------------------------------------------- #
# nouns — including the deverbal homograph guards (must outrank the
# new verbs' mute-e forms: taille, solde, grille, vanne, …)
# --------------------------------------------------------------------- #

NOUNS_BATCH = """
rame piste solde lime panse plâtre grille râpe zeste vanne paille
greffe taille masse bande suture radiographie natte tresse boucle
frise mèche chignon tignasse crinière moustache favoris rouflaquette
barbiche bouc catogan
enclume étau forge soufflet tenaille pince marteau burin ciseau
gouge rabot varlope scie égoïne vilebrequin chignole perceuse
tournevis clé molette écrou boulon rondelle cheville goupille
rivet agrafe clou vis tire-bouchon limaille copeau sciure
étagère échafaudage échelle escabeau treuil palan poulie
cordage câble chaîne maillon crochet mousqueton sangle courroie
poutre solive chevron linteau madrier planche latte liteau
bardeau tuile ardoise zinc gouttière chéneau faîtage lucarne
vasistas imposte linteau0 appui embrasure ébrasement chambranle
moulure corniche plinthe lambris parquet moquette carrelage
faïence mosaïque stuc crépi enduit badigeon chaux mortier
parpaing brique moellon pierre0 granit grès calcaire marbre
ardoise0 silex caillou gravier gravillon sable0 limon argile
glaise tourbe humus terreau compost fumier engrais paillis
semence semis plant bouture greffon marcotte drageon rejet
bourgeon rameau brindille branchage ramure frondaison feuillage
taillis futaie bosquet fourré hallier ronceraie broussaille
clairière layon sentier chemin0 laie0 coupe0 abattis
grume bille0 rondin bûche fagot margotin petit-bois stère
charbonnette braise tison escarbille suie bistre
meule0 gerbe javelle andain fenaison moisson récolte vendange
grappe sarment cep vrille pampre raisin moût lie marc tonneau
barrique foudre0 cuve cuvier pressoir alambic chai cellier
caveau étiquette0 bouchon capsule goulot cubitainer bonbonne
dame-jeanne fiasque gourde bidon jerrican
louche écumoire passoire chinois0 tamis mandoline0 hachoir
éminceur épluche-légumes zesteur dénoyauteur vide-pomme
fouet0 batteur mixeur blender moulin0 pilon mortier0 râpe0
presse-agrumes presse-purée moulinette cocotte faitout marmite
braisière sauteuse poêlon caquelon wok plancha gril barbecue
rôtissoire broche0 lèchefrite tourtière moule0 ramequin terrine0
timbale aspic gelée chaud-froid ballotine roulade paupiette
crépine barde lardon couenne gras-double tripes andouille
boudin crépinette rillettes rillons confit magret
gésier foie0 rognon cervelle museau groin pied0 jarret
paleron macreuse gîte0 aloyau rumsteck entrecôte bavette onglet
hampe araignée0 merlan0 collier0 plat-de-côtes poitrine0 travers0
échine filet0 carré0 selle0 gigot épaule0 souris0 quasi0
noix0 grenadin escalope médaillon mignon tournedos chateaubriand
paupière sourcil cil iris0 pupille cristallin rétine cornée
conjonctive orbite0 arcade pommette mâchoire maxillaire gencive
palais0 luette amygdale pharynx larynx trachée œsophage glotte
épiglotte diaphragme plèvre bronche bronchiole alvéole0 péritoine
pancréas duodénum jéjunum iléon côlon rectum vésicule
urètre uretère néphron glomérule surrénale thyroïde hypophyse
épiphyse thalamus hypothalamus cervelet bulbe0 moelle méninge
synapse neurone axone dendrite ganglion plexus sciatique fémoral
carotide aorte ventricule oreillette valvule péricarde myocarde
endocarde artériole veinule capillaire plaquette globule plasma
lymphe lymphocyte anticorps antigène vaccin sérum antidote
pansement compresse attelle éclisse garrot civière brancard
perfusion intraveineuse piqûre seringue aiguille0 scalpel bistouri
forceps spéculum stéthoscope tensiomètre thermomètre otoscope
électrocardiogramme échographie scanner0 radiologie oncologie
cardiologie neurologie dermatologie pédiatrie gériatrie obstétrique
chirurgie anesthésie réanimation kinésithérapie orthophonie
podologie ophtalmologie rhumatologie urologie
goéland cormoran albatros pétrel sterne macareux pingouin
manchot0 fulmar eider guillemot labbe océanite puffin
mouette0 avocette échasse0 courlis bécasseau chevalier0 gravelot
pluvier vanneau barge0 bécassine huîtrier tournepierre phalarope
busard épervier autour0 milan0 bondrée balbuzard circaète gypaète
percnoptère vautour condor harpie0 caracara crécerelle hobereau
émerillon faucon0 laneret gerfaut sacre0 pèlerin0
chouette0 hibou effraie hulotte chevêche harfang nyctale grand-duc
moyen-duc petit-duc engoulevent martinet0 salangane colibri
jacamar motmot todier calao huppe0 guêpier rollier
pivert épeiche épeichette torcol sittelle grimpereau troglodyte
accenteur rougegorge rossignol gorgebleue rougequeue tarier traquet
merle0 grive0 litorne mauvis fauvette pouillot roitelet
gobemouche mésange rémiz panure loriot étourneau pie0 geai cassenoix
chocard crave corbeau freux corneille pinson0 serin verdier
chardonneret tarin linotte sizerin bouvreuil grosbec bruant ortolan
proyer moineau0 niverolle pipit bergeronnette cochevis alouette0
calandre0 sirli cisticole bouscarle locustelle phragmite lusciniole
hypolaïs
brochet sandre perche0 silure carpe0 tanche gardon rotengle ablette
brème vandoise chevesne hotu barbeau goujon loche0 vairon épinoche
grémille lotte0 anguille lamproie esturgeon saumon0 truite omble
corégone ombre0 éperlan alose féra lavaret huchon apron chabot
blageon toxostome bouvière spirlin
hêtraie chênaie charmille saulaie peupleraie pineraie sapinière
cédraie mélézin aulnaie frênaie érablière boulaie tremblaie
châtaigneraie noyeraie oliveraie orangeraie palmeraie bananeraie
cacaoyère caféière théière0 roseraie lavanderaie houblonnière
cressonnière oseraie vimaie jonchère rizière cannaie
estuaire delta0 méandre confluent affluent défluent bras0
lône javeau atterrissement alluvion limon0 crue décrue
étiage débâcle embâcle seuil0 radier0 berge0 ripisylve
duit épi0 digue batardeau perré enrochement gabion
écluse pertuis vantail ventelle déversoir barrage0 retenue bief
canal0 rigole aqueduc siphon0 buse0 dalot ponceau passerelle
gué bac0 embarcadère débarcadère appontement wharf estacade
jetée môle0 musoir brise-lames épi1 cale0 slip0
darse bassin0 avant-port arrière-port marina mouillage rade0
chenal passe0 atterrage balise bouée espar tourelle0
cardinale latérale0 feu0 phare0 sémaphore vigie0 guetteur
corne0 sirène0 tonnerre0 risée grain0 rafale bourrasque
calmasse0 pétole0 clapot houle0 lame0 déferlante rouleau0
ressac embrun écume0 traîne0 giboulée bruine crachin frimas
verglas givre gelée0 congère poudrerie blizzard tourmente
avalanche coulée0 sérac crevasse0 rimaye moraine névé glacier0
calotte0 inlandsis banquise iceberg pack0 sastrugi
""".split()

NOUNS_BATCH_B = """
préfecture sous-préfecture mairie0 cadastre état-civil greffe0
parquet0 barreau0 bâtonnier magistrature prétoire audience0
plaidoirie réquisitoire verdict sentence0 relaxe acquittement
condamnation sursis récidive préméditation circonstance0
flagrance garde-à-vue comparution inculpation mise-en-examen
détention écrou0 remise0 libération0 probation bracelet0
astreinte injonction assignation citation0 sommation0 exploit0
huissier notaire clerc0 étude0 minute0 expédition0
apostille légalisation0 authentification procuration mandat0
fidéicommis usufruit nue-propriété indivision mitoyenneté servitude
emphytéose viager hypothèque gage0 nantissement caution0 aval0
endossement traite0 billet0 échéance0 protêt agios
virement prélèvement0 acompte arrhes solde0 quittance récépissé
bordereau facture0 ristourne rabais remise1
escompte0 agio créance0 débiteur créancier échéancier moratoire
surendettement redressement0 liquidation0 faillite banqueroute
concordat0 syndic0 curatelle tutelle0 émancipation0 adoption0
filiation0 ascendant descendant collatéral germain0 utérin
consanguin lignée souche0 hoirie succession0 legs0 codicille
testament olographe dévolution réserve0 quotité préciput rapport0
donation0 partage0 licitation soulte usucapion prescription0
forclusion péremption déchéance0 nullité caducité résiliation
résolution0 rescision dédit0 clause0 codicille0
estuaire0 talweg adret ubac soulane versant0 piémont contrefort
barre0 crêt cluse combe0 doline lapiaz aven gouffre0 igue
résurgence exsurgence perte0 poljé karst travertin concrétion
stalactite stalagmite draperie0 gour fistuleuse excentrique0
spéléothème
sonate symphonie concerto0 cantate oratorio motet madrigal
villanelle chaconne passacaille sarabande gigue0 courante0
allemande0 menuet gavotte rigodon pavane galliarde
sicilienne berceuse0 barcarolle prélude0 impromptu
scherzo rondeau0 toccata fugue0 ricercare canon0 contrepoint
polyphonie homophonie monodie plain-chant neume mélisme
ornementation trille mordant0 gruppetto appoggiature acciaccature
arpège gamme0 tessiture ambitus registre0 timbre0 vibrato
trémolo portamento glissando staccato legato pizzicato sourdine
archet0 crin0 colophane cordier chevalet0 volute ouïe0 éclisse0
touche0 sillet frette0 mécanique0 cheville0 cordes0 bourdon0
chanterelle0 médiator plectre onglet0 capodastre
luthier archetier facteur0 accordeur harmonium0 célesta clavecin
épinette virginal clavicorde pianoforte orgue0 tuyau0 soufflerie
sommier0 jeu0 mixture0 fourniture0 cornet0 bombarde cromorne
chalumeau0 musette0 cornemuse biniou bodega cabrette veuze
vielle0 chifonie guimbarde épinette0 cistre mandole mandoline
bouzouki balalaïka cithare kora sitar oud qanun santour
derbouka djembé tambourin0 tamtam bongo conga timbale0 cymbalette
castagnette crécelle sistre triangle0 xylophone vibraphone marimba
glockenspiel carillon0 clochette grelot0 sonnaille
calife sultan vizir émir cheikh chérif0 pacha bey0 dey0 aga0
janissaire mamelouk spahi méhariste goumier zouave0 turco0
tirailleur0 légionnaire0 hussard dragon0 uhlan cuirassier
carabinier0 lancier grenadier0 voltigeur chasseur0 fusilier
sapeur mineur0 pontonnier artilleur canonnier servant0 pourvoyeur
fourrier vaguemestre cantinier vivandière goujat0 argousin
prévôt0 profos0 sergent0 adjudant maréchal0 connétable sénéchal
bailli prévôté échevin consul0 podestat doge0 hospodar voïvode
margrave landgrave burgrave électeur0 stathouder
redingote jaquette0 queue-de-pie frac habit0 spencer0 dolman
pelisse houppelande limousine0 carrick caban
vareuse cabot0 duffle-coat trench gabardine0 imperméable ciré0
suroît capote0 pèlerine capeline mantille fichu0 châle carré1
étole boa0 manchon0 mitaine moufle gantelet crispin0
guêtre houseaux jambière molletière knickers culotte0 rhingrave
trousses0 haut-de-chausses braies chausses0 grègues pourpoint
justaucorps brassière0 camisole caraco guimpe0 plastron0 jabot0
rabat0 fraise0 collerette gorgerette modestie0 fanchon bavolet
cornette0 hennin escoffion atour0 touret0 templette crépine0
résille filet1 bandeau0 ferronnière diadème0 aigrette0 pouf0
tournure0 crinoline panier0 vertugadin basquine faille0 moire
brocart lampas damas0 satin0 taffetas organdi
organza tulle0 mousseline linon batiste percale calicot cretonne
indienne0 toile0 coutil treillis0 bâche0 prélart
""".split()

# --------------------------------------------------------------------- #
# adjectives
# --------------------------------------------------------------------- #

ADJS_BATCH = """
acéré aduste0 aérien affable affairé affété0 agreste aigrelet
alambiqué alangui allusif altier ambré anguleux
anodin antédiluvien apathique âpre aquilin arachnéen ardent0
argentin0 aride0 atone atrabilaire attenant auguste0 automnal
avenant0 badin balourd baroque0 bedonnant benêt besogneux
biscornu blafard blet bonhomme0 bourru bravache brumeux cacochyme
caduc cagneux calamiteux calleux camus canaille0 candide0 capiteux
captieux carabiné caverneux chafouin chagrin0 chenu chétif
chimérique circonspect clairet clandestin0 cocasse colossal
compassé compendieux conquis0 contrit coquin0 coriace cossu
courtaud crasseux crépu cucul0 dadais0 débonnaire décati déconfit
découplé0 dégingandé délétère délicat0 délictueux déluré démesuré
dépenaillé déplaisant désargenté désinvolte desséché diaphane
diligent dispendieux dodu dolent douillet drolatique dru ductile
ébouriffé écarlate échevelé éculé édénique efflanqué effronté
élimé émacié emphatique enchifrené endimanché enjoué
éploré épouvantable erratique escarpé ésotérique estropié étique
étriqué exigu exsangue extatique exubérant facétieux falot famélique
fantasque faraud farfelu fat0 fielleux flagorneur
flandrin0 flasque0 fluet folâtre fourbe0 fringant frisquet
fruste fugace fuligineux funeste gaillard0 gauche0 gironde0 glabre
gourmé goguenard gouailleur grandiloquent grassouillet grivois
guilleret hagard hâve hautain hébété hirsute histrionique hiératique
huileux0 immarcescible impavide impécunieux impérieux impétueux
inane incarnat incongru indicible indigent indolent inepte inextinguible
infatué ingambe inique inlassable insigne0 insipide intempestif
inusité invétéré iridescent jovial judicieux lacunaire ladre
lambin lancinant lapidaire0 laudatif léonin libidineux ligneux
lilliputien limpide loquace louche0 lunatique lustral
macabre madré maigrelet malingre maussade mellifère mélodieux
mièvre mirifique miséreux mordoré morose moustachu mutin0
nacré narquois nébuleux niais noiraud notoire obséquieux
obtus oiseux olivâtre ombrageux onctueux opalin opiniâtre opulent
oblong orageux0 osseux ostentatoire ouaté pâlot
pantois papelard paradoxal parcimonieux patelin0 pataud patibulaire
peccable0 pécuniaire penaud perclus péremptoire perfide pernicieux
perspicace pétulant philistin0 phtisique picaresque piteux pitoyable
placide plantureux pleutre podagre poltron ponctuel pondéré potelé
pouilleux poupin pragmatique préhensile présomptueux prodigue
profus prolixe protéiforme proverbial pudibond puéril pugnace
pusillanime putride quelconque0 quiet quinteux rabougri rachitique
racorni rancunier râpeux ratatiné rébarbatif rebondi récalcitrant
recru0 rêche redondant renfrogné replet retors revêche rhomboïdal
rigide0 risible rocailleux rondelet roublard rubicond rugueux
rustaud rustre0 sagace saugrenu scabreux sclérosé scrofuleux séditieux
sentencieux séraphique sibyllin sirupeux sournois spartiate0
spongieux squameux stoïque strident suave subreptice succinct
suffisant0 superfétatoire suranné sybarite0 taciturne taquin
tatillon ténébreux terne0 terreux têtu tonitruant torve
tortueux trapu truculent turbulent0 vaporeux véhément velléitaire
velu vénal venimeux verbeux vermoulu vétilleux vétuste vieillot
vindicatif visqueux volubile vorace zélé
""".split()

# 1st-group verbs — mind, school, faith, leisure, modern life
VERBS_ER_MODERN = """
numériser mécaniser robotiser miniaturiser optimiser médiatiser
politiser dépolitiser radicaliser libéraliser mondialiser franciser
angliciser latiniser christianiser islamiser laïciser diaboliser
synthétiser magnétiser polymériser hydrolyser électrolyser
vassaliser infantiliser victimiser responsabiliser déculpabiliser
crédibiliser décrédibiliser rentabiliser fluidifier rigidifier
désolidariser fidéliser labelliser officialiser ritualiser
sacraliser désacraliser singulariser régulariser instrumentaliser
institutionnaliser internationaliser départementaliser régionaliser
fiscaliser dépénaliser criminaliser décriminaliser euphémiser
schématiser aromatiser étatiser monétiser démonétiser préconiser
agoniser ioniser vulcaniser américaniser européaniser tyranniser
diviniser féminiser masculiniser moderniser hiverner estiver
communier encenser canoniser lapider flageller ressusciter
transfigurer prophétiser exorciser0
angoisser stresser déstresser complexer décomplexer obséder3
tarauder turlupiner obnubiler subjuguer ensorceler2 épater
estomaquer sidérer3 stupéfier méduser interloquer décontenancer
désarçonner chambouler chambarder indisposer horripiler hérisser
crisper asticoter titiller chiner narguer toiser houspiller
rabrouer rudoyer rembarrer tancer morigéner3 admonester gourmander0
chapitrer réprimander semoncer0 fustiger blâmer0
dribbler shooter smasher lober chronométrer3 sprinter pédaler
dérailler cabrer bluffer jongler0 slalomer1
disserter gloser bachoter recaler ajourner surligner raturer
biffer gommer réfuter argumenter conceptualiser problématiser
paraphraser plagier épousseter2 récurer briquer astiquer lessiver
javelliser désodoriser aérer3 ventiler ramoner détartrer vidanger
zapper flouter zoomer recadrer sonoriser sous-titrer sponsoriser
radiodiffuser boursicoter thésauriser renflouer mutualiser
externaliser délocaliser relocaliser sous-traiter covoiturer
télétravailler réindustrialiser désindustrialiser décarboner0
végétaliser recycler surcycler0 composter
métamorphoser cristalliser0 sublimer0 distiller0 rectifier0
amalgamer coaguler floculer émulsionner homogénéiser centrifuger
décanter0 lixivier0 calciner torréfier griller1 braiser0 étuver
pasteuriser0 ioder phosphater chlorer
fluorer soufrer oxyder désoxyder hydrater
déshydrater réhydrater carbonater décarbonater sulfater0 vitrifier
dévitrifier émailler0 opacifier fluidiser0 gazéifier
liquéfier0 solidifier0 condenser0 vaporiser0 atomiser nébuliser
granuler agglomérer3
fritter0 calandrer gaufrer embosser satiner
moirer chiner0 jasper marbrer veiner moucheter2 tacheter2
zébrer3 tigrer pommeler2
""".split()

# 1st-group verbs — fire and light, war, weather, workshop odds
VERBS_ER_LAST = """
guerroyer batailler escarmoucher canonner torpiller dynamiter
déminer pilonner bivouaquer cantonner caserner patrouiller parader
galonner démobiliser enrôler capituler0 assiéger3 fortifier1
flamboyer rougeoyer verdoyer poudroyer ondoyer chatoyer miroiter
rutiler crépiter charbonner cendrer attiser tisonner embraser
grésiller rissoler0 brasiller enfumer désenfumer
palettiser conteneuriser sangler ligaturer capsuler desceller
décacheter2 timbrer estomper ombrer hachurer crayonner gribouiller
barbouiller badigeonner patiner1 argenter cuivrer bronzer0
pigmenter tartiner mouliner ébouillanter échauder bouillonner
praliner aciduler édulcorer corser pimenter
bruiner crachiner grêler venter embrumer dégoutter goutter
moutonner refluer confluer stagner0
glaner0 grappiller picoter0 mordiller griffer0 agripper
happer gripper dégripper coincer0 décoincer bloquer0 débloquer0
voiler0 dévoiler0 cintrer0 fausser0 redresser0 déformer0
reformer étalonner calibrer jauger0 niveler2 déniveler2 tarer
dérégler3 régler3 désaxer axer centrer0 décentrer excentrer
équilibrer0 déséquilibrer contrebalancer pondérer3 lester0
délester0 alléger3 déplomber désamorcer amorcer1
armer0 désarmer réarmer enclencher déclencher0 débrayer embrayer
caler0 décaler0 recaler0 avancer1 retarder0 remonter0 démonter0
remanier rénover restaurer0 retaper rhabiller
déshabiller0 consolider0 étançonner
""".split()

# 1st-group verbs — science, liturgy, textiles, computing (final tranche)
VERBS_ER_FINAL2 = """
catalyser nitrater ioder azoter titrer0 graduer pyrolyser anodiser
démagnétiser dépolariser irradier0 décontaminer satelliser désorbiter
muer0 officier0 profaner processionner effaroucher endeuiller
égayer0 euphoriser extasier surjeter2 smocker surpiquer
matelasser capitonner rembourrer0 galonner0 passementer soutacher
draper0 cloquer reformater décompiler modéliser désynchroniser
reconnecter câbler recâbler tweeter liker spammer hacker0 chatter
googliser meubler démeubler remeubler ammoniaquer phosphater mordancer apprêter0 désapprêter
encoller décoller0 maroufler rentoiler vermiculer
sténographier dactylographier calligraphier lithographier
sérigraphier photocopier ronéotyper microfilmer plastifier
pelliculer brocher0 relier0 massicoter rogner0 encarter
paginer folioter rubriquer titrer1 maquetter
""".split()

# nouns — minerals, sciences, grammar, architecture, botany, trades
NOUNS_BATCH_C = """
quartz feldspath mica gneiss granit granite basalte porphyre
obsidienne ponce0 tuf calcaire0 dolomie marne gypse albâtre
serpentine stéatite amiante silex meulière grès0 molasse
schiste ardoise0 kaolin argile bauxite latérite limonite
hématite magnétite pyrite galène blende cinabre malachite
azurite turquoise0 lapis-lazuli améthyste citrine topaze
béryl émeraude aigue-marine saphir rubis grenat0 zircon
tourmaline opale onyx agate cornaline jaspe calcédoine
jade néphrite jais ambre0 corail0 nacre perle0
atome molécule ion0 isotope électron proton neutron photon
quark lepton boson neutrino positon antimatière plasma0
catalyseur réactif0 solvant soluté solution0
émulsion suspension0 colloïde enzyme substrat
protéine glucide lipide amidon cellulose chitine kératine
collagène hémoglobine chlorophylle caroténoïde alcaloïde
tanin résine0 latex gomme0 camphre menthol vanilline
nébuleuse galaxie quasar pulsar magnétar astéroïde comète
météore météorite bolide périhélie aphélie apogée périgée
équinoxe solstice zénith nadir azimut parallaxe albédo
constellation zodiaque éphéméride astrolabe sextant théodolite
phonème morphème lexème graphème syntagme prédicat épithète
apposition subordonnée complétive conditionnelle
diphtongue voyelle consonne syllabe tonique élision
liaison0 hiatus césure hémistiche alexandrin octosyllabe
sonnet ballade0 rondeau virelai villanelle sextine élégie
épopée églogue idylle dithyrambe péan épigramme épitaphe
métaphore métonymie synecdoque hyperbole litote euphémisme
oxymore antithèse anaphore épiphore allitération assonance
chiasme zeugme anacoluthe ellipse0 périphrase pléonasme
architrave frise0 corniche fronton tympan0 archivolte
chapiteau socle piédestal stylobate entablement
pilastre colonnade péristyle portique narthex
abside déambulatoire transept croisillon chevet triforium
claire-voie lancette remplage meneau gâble pinacle
arc-boutant contrefort culée voussoir claveau linteau
imposte écoinçon trumeau solin faîtage
chéneau gargouille acrotère antéfixe modillon denticule
mélèze cyprès thuya séquoia araucaria ginkgo
charme0 bouleau aulne frêne érable sycomore
platane tilleul marronnier micocoulier févier savonnier
sorbier alisier cormier néflier cognassier plaqueminier
grenadier0 pistachier caroubier arganier palétuvier
eucalyptus niaouli camphrier santal ébénier acajou
palissandre teck okoumé iroko wengé
fougère prêle lycopode sphaigne lichen anémone renoncule ancolie aconit dauphinelle hellébore
pivoine clématite berbéris épine-vinette nénuphar lotus
coquelicot pavot chélidoine fumeterre capucine réséda
giroflée julienne0 cardamine alliaire monnaie-du-pape
saxifrage orpin joubarbe groseillier cassissier
potentille benoîte aigremoine pimprenelle spirée
astragale0 sainfoin mélilot fenugrec lupin0 vesce
géranium érodium guimauve rose-trémière fuchsia
onagre épilobe salicaire henné
cerfeuil livèche angélique0 carvi cumin coriandre aneth
fenouil badiane bourrache consoude vipérine myosotis
molène véronique0 scrofulaire
plantain passiflore belladone jusquiame datura mandragore
morelle douce-amère physalis piment0 paprika curcuma
gingembre galanga cardamome safran0 sumac câprier
armoise absinthe estragon aurone tanaisie camomille
arnica souci0 zinnia dahlia cosmos0 rudbeckie échinacée
chardon0 cirse panicaut centaurée bleuet scabieuse
chicorée scarole cresson pourpier arroche
bette poirée salsifis scorsonère topinambour crosne
rutabaga panais cerfeuil-tubéreux oca ulluque
igname manioc taro0 patate0 arrow-root sagou tapioca
ébéniste marqueteur tourneur0 doreur0 laqueur vernisseur
tapissier sellier bourrelier malletier gainier
coutelier taillandier ferronnier serrurier0 chaudronnier
dinandier étameur fondeur0 mouleur ciseleur graveur
médailleur armurier arquebusier fourbisseur
horloger pendulier cadranier émailleur0 sertisseur
joaillier diamantaire orfèvre argentier
potier faïencier porcelainier céramiste verrier
souffleur0 miroitier vitrailliste cristallier
tisserand lissier passementier rubanier dentellière
brodeuse lingère couturière modiste chapelier gantier
chamoiseur mégissier parcheminier papetier cartier0
imprimeur typographe linotypiste prote correcteur0
brocheur relieur0 doreur1 enlumineur copiste scribe
""".split()

# adjectives — scholarly, sensory, material (final tranche)
ADJS_BATCH_B = """
igné sédimentaire métamorphique volcanique plutonique
cristallin amorphe poreux friable ductile malléable
fusible réfractaire inoxydable galvanisé étamé
soluble insoluble volatil inerte réactif corrosif
caustique astringent émollient sudorifique fébrifuge
vermifuge0 antiseptique analgésique anesthésique sédatif
soporifique narcotique stupéfiant émétique purgatif
diurétique tonique0 roboratif reconstituant dépuratif
sidéral astral planétaire cométaire météorique zodiacal
équatorial boréal austral circumpolaire héliocentrique
géocentrique elliptique parabolique hyperbolique orbital
phonétique phonologique morphologique syntaxique lexical
sémantique pragmatique dialectal vernaculaire véhiculaire
idiomatique proverbial sentencieux gnomique aphoristique
métaphorique allégorique emblématique symbolique0 figuré
prosodique métrique0 strophique rimé assonancé
roman0 gothique ogival flamboyant0 rayonnant classique0
dorique ionique corinthien toscan composite0
cistercien clunisien carolingien mérovingien capétien
byzantin mauresque mudéjar plateresque churrigueresque
palladien géorgien victorien haussmannien eiffélien
feuillu conifère caduc persistant0 sempervirent
ligneux0 herbacé arbustif buissonnant sarmenteux
grimpant rampant0 tapissant cespiteux stolonifère
bulbeux rhizomateux tubéreux vivace annuel bisannuel
rustique0 gélif mellifère nectarifère pollinifère
marcescent décidu urticant épineux0
""".split()
