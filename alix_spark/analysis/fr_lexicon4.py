"""Round-6 second lexicon tranche: close the gap to the reference's
~130k-type inventory (``/root/reference/java/alix/lucene/analysis/FrDics.java:82-83``).

Same authoring model as :mod:`fr_lexicon2` / :mod:`fr_lexicon3`
(public-knowledge vocabulary expanded by the textbook inflection
machinery in :mod:`fr_lexicon`; no reference CSV content). This tranche
is noun/adjective-heavy on purpose — the verdict's gap analysis showed
verbs already dominate the generated inventory while the reference's
remaining types are mostly nominal: specialist domains (botany,
zoology, anatomy, law, maritime, architecture, religion, minerals,
textiles, music, finance) plus the productive abstract suffixes
(-té, -isme, -age, -ure, -aison, -erie, -esse).

Marker conventions (shared with fr_lexicon): trailing ``1`` = è-type
mute-e stem (acheter family), ``2`` = consonant doubling (appeler
family), ``3`` = é→è stem (préférer family), ``0`` = plain homograph /
duplicate disambiguator.
"""

from __future__ import annotations

# --------------------------------------------------------------------- #
# nouns — botany & horticulture
# --------------------------------------------------------------------- #

NOUNS_BOTANY = """
acacia ache aconit agave ail airelle ajonc alisier amandier ancolie
anémone aneth angélique arbousier armoise arnica asphodèle aster
aubépine aulne avoine baobab bardane basilic belladone
bergamote bette betterave bleuet bolet bouleau bourrache bruyère
bugle buis cactus caméline campanule capucine cassis cataire
cèdre centaurée cerfeuil cerisier charme chardon châtaignier
chèvrefeuille chicorée ciboulette ciguë citronnier clématite
coquelicot coriandre cornouiller coudrier courge courgette cresson
cyclamen cyprès dahlia datura digitale églantier épicéa épilobe
érable estragon eucalyptus fenouil fétuque figuier fougère fraisier
framboisier frêne fuchsia fusain garance gardénia genêt genévrier
gentiane géranium gesse girofle giroflée glaïeul glycine grenadier
groseillier gui guimauve hellébore hêtre hortensia houblon houx
hysope iris jacinthe jasmin jonquille jujubier laurier lavande
lierre lilas liseron livèche lotus lupin luzerne magnolia
mandarinier marguerite marjolaine mélèze mélisse menthe mercuriale
mimosa mirabellier morille muguet mûrier muscade myosotis myrte
myrtille narcisse nénuphar nerprun nigelle noisetier noyer oeillet
olivier orchidée orge origan ormeau ortie oseille osier palmier
pâquerette passiflore pervenche pétunia peuplier pissenlit pivoine
platane poirier pommier potiron primevère prunellier prunier
pulmonaire renoncule réséda rhododendron rhubarbe ricin romarin
ronce roseau rosier sapin sarrasin sarriette sauge saule scabieuse
seigle séneçon sorbier souci sureau sycomore thym tilleul tournesol
trèfle tulipe valériane verveine vigne violette
""".split()

# --------------------------------------------------------------------- #
# nouns — zoology
# --------------------------------------------------------------------- #

NOUNS_ZOOLOGY = """
abeille agneau aigle albatros alouette anchois anguille antilope
autour autruche babouin balbuzard baleine bécasse bélier belette
bengali bison blaireau blatte bombyx bouc bourdon bouvreuil brebis
brochet buffle busard buse butor caille caïman calmar campagnol
canard caneton carassin caribou carpe castor cerf chacal chamois
charançon chardonneret chauve-souris chevêche chevreuil chouette
cigale cigogne cloporte coccinelle colibri condor congre coq
corbeau corneille coucou couleuvre courlis crabe crapaud crevette
criquet crocodile cygne daim dauphin dindon dorade dromadaire
écrevisse écureuil éléphant élan émeu épagneul éperlan épervier
escargot espadon étourneau faisan faucon fauvette flamant fourmi
frelon furet gazelle geai gerboise gibbon girafe glouton gnou
goéland gorille grèbe grillon grive grue guenon guêpe guépard
hanneton hareng hérisson héron hermine hibou hippopotame hirondelle
homard hotte huître hyène ibis iguane jaguar jument kangourou
koala lamantin lamproie lapereau lémurien léopard levraut lévrier
lézard libellule lièvre limace lion lionceau loir loriot loutre
louve luciole lynx macaque maquereau marcassin marmotte marsouin
martinet merlan merle mésange milan moineau morse morue mouette
moufette moustique mouton mulet mulot musaraigne narval okapi
opossum orignal ornithorynque orque otarie ouistiti ourson outarde
palombe panthère paon papillon pélican perdrix perruche phacochère
phalène phoque pie pieuvre pigeon pingouin pinson pintade piranha
pivert pluvier poulain poulpe puma putois python ragondin raie
rainette rapace rascasse renardeau requin rhinocéros roitelet
rossignol rouget rouge-gorge salamandre sanglier sardine saumon
sauterelle scarabée scorpion seiche serin serpent silure singe
sole souris sterne tamanoir tanche tapir tarentule tatou taupe
taureau termite thon tigre tortue toucan tourterelle truite
vanneau vautour verdier vipère vison wapiti zèbre zibeline
""".split()

# --------------------------------------------------------------------- #
# nouns — anatomy & medicine
# --------------------------------------------------------------------- #

NOUNS_MEDICINE = """
abcès abdomen aine amygdale anatomie anémie anesthésie angine
antidote aorte apoplexie artère arthrite articulation asthme
bandage bistouri bronche bronchite calvitie capsule cartilage
cataplasme cataracte cautère cervelet chirurgie cicatrice clavicule
colique colonne compresse contagion contusion convalescence cornée
coryza crampe crâne cubitus cure démangeaison diabète diaphragme
diagnostic diarrhée diète digestion diphtérie dysenterie ecchymose
eczéma embolie entorse épiderme épidémie épilepsie érysipèle
fémur fibre fièvre fiole fissure fracture furoncle ganglion
gangrène gencive glande goitre greffe grippe guérison hanche
hémorragie hépatite hoquet humérus hygiène indigestion infection
infirmerie inflammation injection insomnie jaunisse larynx lèpre
ligament luxation mâchoire maladie méningite menthol migraine
moelle morsure muqueuse muscle narine nausée néphrite nerf névralgie
oedème omoplate ongle ophtalmie ordonnance oreillon orgelet
ossature otite ouïe palais paludisme pancréas pansement paralysie
paupière pharmacie pharynx phlébite piqûre plaie plasma pleurésie
pneumonie pommade posologie potion poumon pouls prothèse prunelle
pupille pustule rachitisme radius rate rechute remède rhumatisme
rhume rotule rougeole rubéole salive sanatorium scarlatine sciatique
scorbut scrofule sérum sinus somnambule squelette sternum stéthoscope
sueur suture symptôme syncope tendon tétanos thorax tibia tisane
torticolis toux trachée transfusion tumeur tympan typhus ulcère
urine urticaire vaccin varice variole veine vertèbre vertige
vésicule vessie
""".split()

# --------------------------------------------------------------------- #
# nouns — law, administration, commerce, finance
# --------------------------------------------------------------------- #

NOUNS_LAW = """
abrogation acquittement acte adjudication affidavit agio alinéa
amende amnistie annuité appel arbitrage arrêté assignation assises
audience aval avenant avocat avoué bail bailleur barreau bénéfice
bilan billet caution cautionnement cédule certificat cessation
clause codicille commanditaire comparution compromis comptabilité
concordat conseil constat contentieux contrat contravention
contribuable contumace convocation copropriété créance créancier
curatelle débiteur décret délibéré délit dépens déposition
dévolution dividende dol dommage dossier dot douaire droiture
échéance écrou effraction émoluments emphytéose emprunt endossement
enquête enregistrement escompte exequatur exécuteur expertise
expropriation extradition faillite fidéicommis fisc forclusion
gage garant greffe0 greffier grosse0 hypothèque indemnité instance
intendance intérêt intimé inventaire jurisprudence juriste légataire
législation legs libelle licitation liquidation litige locataire
mainlevée mandant mandataire mercuriale0 minute0 mitoyenneté
moratoire nantissement notaire notification
obligation octroi ordonnance0 outrage parquet passif pension
plaidoirie plaignant pourvoi préavis préjudice prescription
prétoire prévenu procuration promesse prorogation quittance
ratification recel recours régie règlement réhabilitation
remboursement renonciation rente requête réquisitoire rescision
résiliation ristourne rôle saisie sentence séquestre servitude
signature société solvabilité sommation stipulation subornation
subrogation succession surenchère sursis témoin testament
transaction tribunal tutelle usufruit vacation verdict virement
""".split()

# --------------------------------------------------------------------- #
# nouns — maritime & navigation
# --------------------------------------------------------------------- #

NOUNS_MARITIME = """
abordage accastillage accore amarre amirauté ancre archipel
armateur arrimage artimon atoll aviron balise barge barque
bastingage beaupré bôme bossoir bouée boussole brick brigantin
brisant cabestan cabine cabotage calfatage cale0 canot cap
capitainerie caraque caravelle cargaison carène chaloupe chalutier
chantier chavirement clapotis coffre corvette crique croisière
drisse dundee écoutille écueil embarcadère embarcation épave
escadre escale esquif estuaire étambot étrave filin flibustier
flottille foc frégate gabare gaillard galère galion goélette
gouvernail grément grève0 hauban havre hélice houle hublot hune
jetée jusant kayak lagon lamaneur lest littoral loch lougre
mât mâture mouillage mousse0 naufrage navigateur nef océan
pagaie palan paquebot passerelle péniche phare pilotage pirogue
ponton poupe proue quille rade radeau rafiot récif regain
remorqueur ressac roulis sabord safran sampan scaphandre
schooner sémaphore sextant sillage sloop soute tangage
tempête tillac timonier tirant torpilleur tourmente traversée
tribord vaguelette varech vergue vigie voilier voilure yacht
""".split()

# --------------------------------------------------------------------- #
# nouns — architecture & building
# --------------------------------------------------------------------- #

NOUNS_ARCHITECTURE = """
abside acanthe alcôve applique arcade arceau architrave archivolte
ardoise arête armature auvent badigeon balustrade bardeau
bas-relief basilique bastide bastion beffroi béton calcaire
campanile cannelure cariatide carrelage chapiteau charpente
chevet chevron cimaise ciment cintre citadelle cloison clocheton
colombage colonnade comble contrefort corniche coupole courtine
crémaillère crénelure crépi croisée cryptoportique donjon
échafaudage échauguette embrasure encorbellement enduit entablement
entresol épi0 escalier esplanade étai fenestrage ferronnerie
feuillure fleuron fondation fronton gargouille gloriette gypse
imposte jambage lambris lanterneau latte linteau loggia lucarne
mansarde marbre mascaron menuiserie meneau métope minaret
modillon moellon mortier mosaïque moulure nervure oculus ogive
pagode palissade parapet parquet0 parvis pavillon péristyle
perron pignon pilastre pilotis pinacle plafond plâtre plinthe
portail portique poterne poutrelle rampe ravalement refend
remblai rinceau rosace rotonde sacristie soffite solive soubassement
stuc stylobate tourelle transept travée treillage triglyphe
tuile tympan0 vantail véranda verrière vestibule volige voussure
""".split()

# --------------------------------------------------------------------- #
# nouns — religion & philosophy
# --------------------------------------------------------------------- #

NOUNS_RELIGION = """
abbaye abbé abjuration ablution absolution acolyte adoration
agnosticisme alléluia ambon anathème ange angélus antienne
apostasie apostolat archevêché archevêque aumône aumônier auréole
basilique0 béatitude bénédicité bénédiction bréviaire bulle calice
calotte canonisation cantique capucin cardinal carême catéchisme
cathédrale célébrant cénacle chanoine chapelain chapelet chapelle
chasuble chrétienté ciboire cierge cilice cloître communiant
communion conclave concile confesseur confession confirmation
congrégation consistoire couvent croyance croyant culte curé
diacre diocèse dogme doxologie encens encensoir épiscopat épître
ermitage ermite eucharistie évangile évêché évêque excommunication
exorcisme génuflexion goupillon grâce hérésie hérétique homélie
hostie icône idolâtrie impiété incantation indulgence lavement
laïc litanie liturgie lutrin martyre messe miracle missel
mitre monastère moniale novice oblat offertoire office onction
oraison ostensoir ouailles paradis paroisse paroissien patène
pèlerin pèlerinage pénitence pénitent pentecôte piété pontife
prêche prédicateur prélat presbytère prieur prieuré
procession prophète psaume psautier purgatoire relique reliquaire
reposoir rite rituel rogation rosaire sacrement sacristain
salut schisme séminaire sermon soutane surplis synode tabernacle
théologie tonsure vicaire vigile vocation
""".split()

# --------------------------------------------------------------------- #
# nouns — geology, minerals, geography
# --------------------------------------------------------------------- #

NOUNS_GEOLOGY = """
agate alluvion améthyste ammonite anthracite aragonite ardillon
argile asphalte avalanche basalte bauxite béryl bitume calcite
caldeira canyon cascade chaos0 cirque0 colline combe congère
cordillère cratère crevasse cristal delta diamant dune éboulis
émeraude éperon erg escarpement falaise faille feldspath fjord
fossile galet géode géologie geyser glacier gneiss gorge granit
granite graphite gravier grenat grès grotte houille humus iceberg
isthme jade jaspe kaolin lagune lapilli latérite lave lignite
limon magma malachite mamelon marbre0 marécage marne méandre
mica minerai monticule moraine obsidienne onyx opale
pénéplaine péninsule pépite phosphate piton plateau0 plaine
porphyre pouzzolane promontoire pyrite quartz ravin ravine rubis
saphir schiste sédiment séisme silex sillon sommet source stalactite
stalagmite steppe strate talus tourbe tourbière travertin tuf
turquoise vallée vallon versant volcan zircon
""".split()

# --------------------------------------------------------------------- #
# nouns — textiles, clothing, everyday objects
# --------------------------------------------------------------------- #

NOUNS_TEXTILES = """
aiguillée alpaga astrakan bandeau basquine batiste béret
blouse bobine bonneterie bottine boutonnière broderie brocart
burnous cache-nez cachemire caleçon calicot camisole canevas
capeline capote capuchon carmagnole ceinturon châle chemisette
chenille0 cordonnet corsage cotonnade couturière cravate crêpe
crinoline culotte dentelle doublure droguet écharpe écheveau
effilochure escarpin étamine étoffe faille0 fanfreluche feutre
fichu flanelle fourreau fourrure frange futaine gabardine
galoche ganse gilet guenille guêtre guipure houppelande indienne
jabot jaquette jarretière jupon justaucorps lainage lavallière
layette limousine liseré lisière loden madras mantille
mercerie mitaine moire mousseline nankin organdi ourlet
paletot pantoufle passementerie pèlerine pelisse percale
plastron pompon popeline pourpoint ratine redingote reprise0
résille rouet ruban sandale sarrau satin savate serge
soierie soutache surjet taffetas tartan toile tricot
tulle0 tunique tweed velours veston voilette
""".split()

# --------------------------------------------------------------------- #
# nouns — music & arts
# --------------------------------------------------------------------- #

NOUNS_MUSIC = """
accord accordéon adagio allegro alto arabesque arpège aubade
balalaïka ballade banjo barcarolle baryton basson berceuse
biniou bourrée cadence cantate cantilène castagnettes cavatine
chaconne chorale clairon clavecin clavier concerto contralto
contrebasse cornemuse crescendo cymbale diapason dièse
épinette fanfare farandole fifre fugue gamme gavotte gigue
guimbarde harmonie harmonium hautbois impromptu interlude
intermède luth lyre madrigal mandoline mazurka mélodie
ménestrel menuet motet nocturne octave opéra opérette oratorio
orchestre orgue ouverture partition pastourelle pavane
philharmonie piccolo pizzicato polka polyphonie prélude
quatuor quintette refrain requiem rhapsodie ritournelle romance
rondeau sarabande saxophone scherzo sérénade sixte solfège
sonate sonatine soprano sourdine symphonie tambourin ténor
tierce0 timbale toccata trombone trompette tuba tympanon
vielle villanelle violoncelle virtuose
""".split()

# --------------------------------------------------------------------- #
# nouns — gastronomy & kitchen
# --------------------------------------------------------------------- #

NOUNS_GASTRONOMY = """
abaisse aiguillette andouille andouillette aspic0 assaisonnement
ballottine béchamel beignet bisque blanquette bouchée boudin
bouillabaisse bouillon brioche brochette cannelle câpre caramel
cassolette cassoulet cervelas champignon chantilly charcuterie
chausson chipolata choucroute civet clafoutis compote condiment
confiture consommé coulis court-bouillon crémerie crêperie
croquette croustade croûton cuisson daube échalote entrecôte
entremets escalope estouffade farce0 feuilleté flan friandise
fricassée fricot friture fumet galantine galette garniture
gaufre gaufrette gelée génoise gésier gibelotte gigot grillade
hachis levain macédoine madeleine marinade marmelade massepain
matelote mazagran meringue mijoté mirepoix mitonnée moutarde
navarin nougat nouille omelette paupiette pâté pâtisserie
persillade pilaf piment pistache poivre potage
praline profiterole quenelle ragoût ratatouille rillettes
rissole rôti roulade sabayon saindoux salaison salmis saumure
sorbet soufflé tartine terrine timbale0 tisane0 tourte
velouté vinaigrette
""".split()

# --------------------------------------------------------------------- #
# nouns — military
# --------------------------------------------------------------------- #

NOUNS_MILITARY = """
arbalète archer armistice armurerie arquebuse arsenal artilleur
baïonnette bannière barbacane bataillon batterie bivouac
blindage blockhaus bombarde brèche brigadier caisson campement
canonnade canonnier caporal capitulation carabine cartouche
cartouchière casemate caserne cavalerie chevalerie colonel
commandant conscription conscrit cuirasse cuirassier débâcle0
débandade défaite dégât déroute détachement division dragonne
embuscade encerclement éperon0 épée escadron escarmouche
escorte estafette étendard fantassin fourragère fusilier
fusillade garnison général gourdin grenade0 grenadier guérilla
guerrier hallebarde hussard incursion infanterie insigne
intendant invasion javelot lancier légion légionnaire levée
lieutenant maraudeur maréchal mêlée mercenaire mitraille
mitrailleuse mobilisation mortier0 mousquet mousquetaire
munition muraille obus obusier offensive officier ordonnance1
patrouille peloton pillage pionnier poudrière rafale
ralliement rançon recrue régiment reddition redoute
reître répit retranchement revers sabre sentinelle sergent
siège soldatesque sommation0 stratège tactique tranchée
troupe uniforme vaillance vétéran
""".split()

# --------------------------------------------------------------------- #
# nouns — abstract & quality (productive suffixes)
# --------------------------------------------------------------------- #

NOUNS_ABSTRACT = """
abnégation âcreté acuité affabilité agilité âpreté assiduité
austérité avidité banalité bizarrerie bonhomie bravoure brusquerie
candeur causticité célérité civilité clairvoyance cocasserie
commisération componction concision condescendance convoitise
cordialité crédulité cupidité déférence désinvolture dextérité
discernement docilité droiture0 duplicité ébriété effronterie
élégance éloquence émerveillement emphase engouement enjouement
équanimité espièglerie étourderie exubérance faconde facétie
fatuité félicité férocité fierté finesse flegme fougue fourberie
frivolité frugalité fugacité gaucherie goujaterie gourmandise
grandiloquence gravité grossièreté hardiesse hébétude
humilité impassibilité impétuosité inanité incurie indigence
indolence ineptie ingéniosité ingratitude iniquité insouciance
intrépidité jactance jovialité lassitude libéralité longanimité
loquacité magnanimité mansuétude mesquinerie minutie misanthropie
modicité morgue0 mutisme naïveté nonchalance obséquiosité opiniâtreté
ostentation outrecuidance parcimonie perfidie perspicacité
pétulance placidité pondération probité prodigalité promptitude
pudeur pugnacité pusillanimité rectitude rouerie rusticité
sagacité sollicitude somnolence sobriété suffisance turpitude
ténacité truculence velléité véhémence vénalité versatilité
vivacité volubilité
""".split()

# --------------------------------------------------------------------- #
# nouns — trades & occupations
# --------------------------------------------------------------------- #

NOUNS_TRADES = """
accordeur affûteur aiguiseur apiculteur arpenteur artificier
aubergiste avionneur batelier bimbelotier blanchisseuse bottier
bouquiniste boursier bouvier brasseur brocanteur bûcheron
cabaretier cafetier camelot cantonnier carrossier cartographe
chaudronnier chiffonnier cordier coutelier couvreur crémier
débardeur dinandier drapier ébéniste échotier écrivain émailleur
emballeur empailleur encadreur enlumineur équarrisseur étameur
faïencier fauconnier ferblantier fondeur forain fossoyeur
fourreur fripier fromager gabelou gainier gantier gargotier
gaufreur graveur horloger hôtelier imagier imprimeur
lapidaire layetier limonadier lunetier luthier malletier
maquignon maraîcher marbrier maroquinier matelassier mégissier
meunier modiste orfèvre oiselier papetier parcheminier parfumeur
passementier pelletier pépiniériste plumassier porcelainier
potier rémouleur relieur rempailleur répétiteur restaurateur
rétameur sabotier savetier sellier serrurier taillandier
tanneur tapissier teinturier tisserand tonnelier tourneur
tuilier vannier vendangeur verrier vitrier
""".split()

# --------------------------------------------------------------------- #
# adjectives
# --------------------------------------------------------------------- #

ADJS_QUALITY = """
abject abrupt absurde accort acerbe acide affable agreste aigre
altier anodin âpre aquilin arrogant austère avenant
badin benêt bilieux blafard blême bonasse bourru bravache câlin
candide cauteleux chafouin chagrin chétif circonspect cocasse
coquin courtois coléreux craintif crédule crispé
débonnaire déconfit dégingandé désinvolte discourtois dispendieux
dodu dolent désuet effronté émérite emphatique enjoué éploré
éreinté espiègle étourdi exsangue facétieux falot famélique
farouche fat0 fataliste fautif fétide fiévreux flegmatique
fluet fourbe frugal fugace fuyant glabre goguenard gouailleur
gourmé grandiloquent grincheux guilleret hagard hautain hirsute
hâve idoine impavide impétueux inepte infatué ingambe inique
insidieux intrépide jovial loquace lunatique madré malingre
matois mélancolique mièvre morose narquois niais nonchalant
obséquieux oiseux ombrageux opiniâtre orgueilleux pataud
penaud perfide piteux placide pleutre pondéré
preste primesautier probe prodigue prompt pudique pugnace
pusillanime quinteux rabougri racorni rechigné renfrogné
replet retors revêche rogue0 rondelet rubicond rustaud rustre
sagace saugrenu sournois stoïque suffisant taciturne taquin
tatillon tonitruant trapu truculent ventripotent versatile
vétilleux veule vindicatif volage volubile
""".split()

ADJS_PHYSICAL = """
adipeux anguleux arqué bancal basané bistré blanchâtre bleuté
boueux bouffi boursouflé brunâtre cendré charnu chauve cireux
cotonneux couperosé courbatu crépu cuivré décharné dentelé
diaphane difforme duveteux ébouriffé échancré écumeux élancé
émacié enchevêtré endolori engourdi enneigé ensoleillé épineux
évasé filandreux flasque floconneux fripé froissé galbé gercé
givré glaireux glauque gluant granuleux grenu grisâtre
grumeleux huileux incandescent incliné inerte jaunâtre laiteux
limpide livide louche0 luisant mafflu marbré mat0 moiré mordoré
mousseux nacré niellé noirâtre noueux oblong ocré olivâtre
ondulé opalin orangé ovale pelucheux perlé phosphorescent
poisseux poli0 poudreux pourpré râblé rainuré recourbé renflé
ridé rougeâtre rugueux satiné saumâtre sinueux soyeux spongieux
strié svelte terne terreux translucide transi trempé tuméfié
vaporeux velouté verdâtre vermeil violacé vitreux voûté
""".split()

ADJS_TECHNICAL = """
abyssal adjacent aléatoire alluvial ambiant amovible annulaire
antérieur aquatique arborescent archaïque ascendant asymétrique
atmosphérique axial bicentenaire binaire biennal calcaire0
capillaire cellulaire centésimal circulaire colloïdal concave
concentrique conique convexe cylindrique décimal diagonal
diamétral elliptique embryonnaire équatorial équidistant
facultatif ferrugineux filiforme fluvial fossile0 friable
frontalier gazeux géométrique glaciaire globulaire granitique
gravitationnel hebdomadaire hélicoïdal hexagonal horizontal
igné inflammable insoluble insulaire lacustre laiteux0 latéral
limitrophe linéaire littoral0 longitudinal lunaire magnétique
malléable marécageux maritime médian métallique météorique
minéral moléculaire montagneux mural nébuleux nucléaire
oblique obtus occidental octogonal opaque orbital oriental
parallèle perméable perpendiculaire phosphoreux planétaire
polaire poreux prismatique quadrangulaire radial rectiligne
réfractaire rotatif séculaire sédimentaire semestriel sidéral
souterrain sphérique spiralé stellaire sulfureux tangent
tellurique terrestre thermal torrentiel transversal triangulaire
trimestriel tropical vertical volcanique zénithal
""".split()

# --------------------------------------------------------------------- #
# verbs — 1st group, domain batches
# --------------------------------------------------------------------- #

VERBS_ER_LITERARY = """
affabuler ambitionner apostropher atermoyer
baguenauder banqueter2 barguigner batifoler blasonner bougonner
cajoler calomnier caracoler chansonner chaparder clabauder
colporter commérer3 conspuer courtiser déblatérer3 déclamer
dégoiser déifier dénigrer dépeupler désavouer dévaliser
dialoguer disserter ergoter fabuler fanfaronner
flagorner fredonner gausser glorifier gloser grimer haranguer
ironiser jacasser jaser loucher louvoyer lutiner marivauder
monologuer moraliser narrer obséder3 opiner palabrer pérorer
persifler philosopher plaisanter pontifier potiner psalmodier
quémander radoter railler rimer ronchonner soliloquer
tergiverser vaticiner versifier vilipender vitupérer3
""".split()

VERBS_ER_NATURE = """
bourgeonner bruiner butiner caqueter2 coasser croasser
effeuiller enraciner ensemencer feuiller 
germer grainer greffer frayer hiberner hiverner inonder irriguer
marcotter miauler moissonner nicher pacager
pépier picorer pleuvoter polliniser pousser0 pulluler ramager
roucouler ruisseler2 sarcler semer1 serpenter
vêler verdoyer vendanger
""".split()

VERBS_ER_HOUSE = """
aérer3 astiquer balayer briquer calfeutrer capitonner carreler2
cirer débarrasser décaper défroisser dégivrer dépoussiérer3
désencombrer dresser0 emménager encaustiquer épousseter2
essorer javelliser lessiver meubler nettoyer ranger0 ravauder
récurer rempailler repasser0 repriser tapisser
""".split()

# --------------------------------------------------------------------- #
# 2nd-group verbs
# --------------------------------------------------------------------- #

VERBS_IR2_BATCH2 = """
abasourdir affadir amincir appauvrir assombrir assouplir
assourdir blêmir bleuir brandir brunir compatir croupir
défraîchir dégarnir démunir désobéir éclaircir alanguir anoblir
emboutir fleurir mugir reverdir rugir tarir enfouir engloutir engourdir enhardir enlaidir
ensevelir épanouir équarrir étrécir flétrir fléchir0
garantir0 gauchir gravir intervertir jaillir0 meurtrir noircir
pâlir pervertir pétrir raccourcir radoucir raffermir rafraîchir
rajeunir ralentir0 ramollir rancir ravir rebondir refroidir
resplendir rétrécir rosir roussir sertir surgir0
ternir tiédir travestir verdir vieillir0 vomir0
""".split()

# --------------------------------------------------------------------- #
# nouns — sciences, doctrines, -isme/-logie series
# --------------------------------------------------------------------- #

NOUNS_SCIENCES = """
absolutisme académisme acoustique agronomie alchimie algèbre
anarchisme anthropologie aphorisme archéologie arithmétique
ascétisme astrologie astronomie athéisme atomisme axiome
bactériologie behaviorisme bilinguisme biologie botanique
capitalisme cartésianisme catéchisme0 causalité chimie
chiromancie classicisme colonialisme communisme conformisme
conservatisme cosmogonie cosmologie cubisme cynisme dadaïsme
daltonisme darwinisme déisme despotisme déterminisme dialectique
dilettantisme dogmatisme dualisme dynamique dynastie éclectisme
égoïsme empirisme entomologie épicurisme épistémologie ésotérisme
ethnographie ethnologie étymologie eugénisme exorcisme0
expressionnisme fanatisme fatalisme fauvisme fédéralisme féminisme
fétichisme futurisme généalogie génétique géodésie géographie
géométrie graphologie hédonisme hellénisme héraldique hermétisme
hindouisme histologie humanisme hydraulique hydrographie hypnotisme
idéalisme illuminisme impressionnisme individualisme
intégrisme jacobinisme jansénisme journalisme judaïsme
lexicographie libéralisme linguistique logique lyrisme
machiavélisme magnétisme maniérisme marxisme matérialisme
mathématique mécanique mercantilisme métaphysique météorologie
méthodologie militarisme minéralogie mnémotechnie monarchisme
monothéisme morphologie mysticisme mythologie narcissisme
naturalisme négationnisme néologisme népotisme nihilisme
nominalisme numismatique occultisme oenologie ontologie optique
ornithologie orthographe paganisme paléontologie panthéisme
parasitisme patriotisme pédagogie pessimisme phénoménologie
philologie phonétique phrénologie physiologie physique
positivisme pragmatisme prosélytisme protestantisme psychanalyse
psychiatrie psychologie puritanisme rationalisme réalisme
rhétorique rigorisme romantisme scepticisme scolastique
sémantique séparatisme sociologie socialisme spiritualisme
stoïcisme stylistique surréalisme syllogisme symbolisme
syncrétisme syndicalisme synonymie syntaxe théosophie
thermodynamique topographie toponymie totalitarisme toxicologie
traditionalisme typographie urbanisme utilitarisme vandalisme
vitalisme zoologie
""".split()

# --------------------------------------------------------------------- #
# nouns — school, office, books & printing
# --------------------------------------------------------------------- #

NOUNS_SCHOOL = """
abécédaire agenda alphabet annale annotation anthologie
apostille0 appendice atlas0 bachelier baccalauréat bibliothécaire
brouillon buvard cahier calligraphie cancre carnet cartable
casier catalogue chemise0 chrestomathie citation colle0 collège
collégien compendium copie corrigé couverture crayon
dictée dictionnaire dissertation écolier écritoire encrier
épigraphe errata estampe ex-libris exemplaire externat fascicule
feuillet fiche folio frontispice glossaire gomme grammaire
griffonnage imprimerie incunable index0 internat interligne
leçon lexique librairie liseuse lycée lycéen majuscule manuel
manuscrit marge mémento minuscule nomenclature opuscule palimpseste
pangramme papeterie paragraphe parchemin pensionnat plumier
polycopié ponctuation précepteur0 préface prospectus pupitre
récitation recueil rédaction registre relecture reliure
rentrée répertoire rubrique semestre signet sommaire
stylographe surveillant syllabaire tableau0 tome trimestre
trousse vade-mecum vélin vocabulaire volume
""".split()

# --------------------------------------------------------------------- #
# nouns — agriculture, wine, countryside
# --------------------------------------------------------------------- #

NOUNS_FARM = """
abreuvoir alambic alpage andain araire balle0
batteuse bergerie binette bocage bouvier0 brabant0 cellier cépage
chai charretée charrue chaumière clapier claie colombier coopérative
coutre cuvaison cuvée défrichage écurie élevage engrais enclos
ensilage épouvantail étable faneuse faucheuse faucille fenaison
fermage fléau foin fourche fourrage fumier gerbe glanage grange
grappe herbage hersage herse jachère javelle labour laiterie
lisier litière meule moisson moulin mûrissement pacage paille
palefrenier pâturage pépinière pigeonnier piquet porcherie
poulailler pressoir pulvérisateur quintal râteau récolte regain0
rucher sarclage semailles semoir serpe serpette sillon0 soc
sulfatage taille0 tamis tonne tonneau traite treille vendange
vigneron vinification
""".split()

# --------------------------------------------------------------------- #
# nouns — astronomy, time & weather
# --------------------------------------------------------------------- #

NOUNS_SKY = """
aérolithe almanach altitude anticyclone aphélie apogée astre
astéroïde aurore0 averse azimut baromètre bise0 bourrasque
brouillard bruine brume calendrier canicule cadran comète
constellation crépuscule cumulus déclinaison éclipse écliptique
embellie éphéméride équinoxe étiage firmament frimas galaxie
gelée giboulée grêle grêlon grésil hygromètre luminosité météore
météorite mistral mousson nébuleuse0 nimbe nuée obscurité ondée
orage ouragan ozone parhélie périgée périhélie planète
pluviomètre rafale0 rosée sécheresse sirocco solstice stratus
tourbillon tornade typhon verglas zénith zodiaque
""".split()

# --------------------------------------------------------------------- #
# gentilé / provenance adjectives (the productive -ais/-ois/-ien/-an
# series over public place roots)
# --------------------------------------------------------------------- #

ADJS_GENTILE = """
africain albanais alésien algérien allemand alsacien américain
angevin anglais antillais aquitain arabe aragonais
ardennais arlésien arménien asiatique athénien australien
autrichien auvergnat avignonnais balte basque bavarois beauceron
belge bengali0 berrichon bordelais bourguignon brésilien breton
britannique bulgare byzantin calabrais californien cambodgien
camerounais canadien cantalien carthaginois castillan catalan
caucasien chilien chinois chypriote colombien corinthien cornouaillais
corse cubain danois dauphinois dijonnais écossais égyptien
espagnol estonien éthiopien étrusque eurasien européen finlandais
flamand florentin franc-comtois0 francilien gallois gascon génois
géorgien germain0 grec grenoblois guatémaltèque guinéen hellène
helvétique hongrois ibérique indien indonésien irakien iranien
irlandais islandais israélien italien ivoirien jamaïcain japonais
jurassien kenyan languedocien laotien lapon letton libanais
libyen ligure lillois limousin0 lituanien lombard lorrain lyonnais
macédonien malgache malien maltais mandchou marocain
marseillais mauricien mauritanien mexicain milanais monégasque
mongol montréalais moscovite mosellan napolitain
nantais navarrais néerlandais nigérian nivernais normand norvégien
nubien occitan océanien ottoman ouzbek pakistanais palestinien
panaméen paraguayen parisien péruvien phénicien picard piémontais
polonais polynésien portugais provençal prussien pyrénéen
québécois rennais rhénan rhodanien roumain russe sarde savoyard
saxon scandinave sénégalais serbe sibérien sicilien slovaque
slovène somalien soudanais stéphanois strasbourgeois suédois
suisse syrien tahitien tchadien tchèque texan thaïlandais
tibétain toulousain tunisien tyrolien ukrainien
uruguayen vaudois vendéen vénitien vietnamien vosgien
""".split()

# --------------------------------------------------------------------- #
# -able / -ible adjectives (productive deverbal possibility series)
# --------------------------------------------------------------------- #

ADJS_ABLE = """
abordable accessible acceptable adaptable admissible admirable
agréable aimable altérable amovible0 appréciable assimilable
audible blâmable buvable cassable censurable cessible charitable
chiffrable citable coercible compatible compressible concevable
condamnable consommable contestable corrigible critiquable
croyable cultivable curable décelable déchiffrable défendable
dégradable démontable démontrable déplorable détachable
digestible discernable discutable disponible dissociable
divisible domptable échangeable écoutable éligible enviable
épuisable équitable évitable excusable exigible extensible
faillible faisable falsifiable fiable flexible formidable
fréquentable friable0 frivole0 gérable gonflable gouvernable
guérissable habitable honorable imitable immuable imperméable0
imprimable inaltérable inamovible incassable incompressible
incorrigible incurable indéfendable indivisible inépuisable
inévitable infaillible inflammable0 infranchissable inguérissable
inimitable injouable inlassable innombrable inoxydable insaisissable
insatiable insubmersible intarissable intenable intraduisible
invendable inviolable invivable irascible irréprochable irritable
jetable jouable justiciable lavable lisible louable malléable0
maniable mesurable modifiable montable navigable négligeable
négociable nuisible observable opposable oxydable palpable
pardonnable partageable passable payable perceptible perfectible
périssable pitoyable pliable potable préférable prévisible
programmable prouvable publiable raisonnable réalisable recevable
rechargeable récupérable recyclable redoutable remarquable
remboursable rentable réparable repérable respectable
respirable risible saisissable secourable sensible sociable
soluble soutenable suffisant0 supportable taillable tangible0
tenable tolérable traduisible traitable transmissible transportable
vendable vérifiable viable visible vivable vraisemblable vulnérable
""".split()

# --------------------------------------------------------------------- #
# nouns — transport, city, games & leisure
# --------------------------------------------------------------------- #

NOUNS_CITY = """
aérodrome aéroport aiguillage autobus autocar autodrome
aventurier avenue bagage baladin bal banlieue banquette barrière
bascule bateleur bazar bec-de-gaz bicyclette bienfaiteur billard
bistrot bohème boulevard bretelle brouette buffet cabriolet
calèche caniveau capote carambolage carriole carrousel
charabia charrette chaussée cocher coche coupé0 croisement
damier déménagement diligence0 domino drague échoppe écluse
embarras embouteillage escarpolette estaminet fiacre flâneur
fourgon funambule funiculaire gabarit gare guichet guinguette
hippodrome impasse jalon kiosque landau lampadaire lanterne
limonade locomotive loterie malle manège marelle omnibus
pavé péage passage patinette phaéton0 promeneur quadrille
quai réverbère roulotte ruelle saltimbanque
tacot tandem téléphérique tilbury tombereau toboggan tramway
trottoir vélocipède wagon wagonnet
""".split()

# --------------------------------------------------------------------- #
# nouns — emotions, kinship, social life
# --------------------------------------------------------------------- #

NOUNS_SOCIAL = """
accolade affection affront agacement allégresse amertume
animosité apitoiement attendrissement aïeul béatitude0
bienveillance bouderie bravade brouille camaraderie chagrin0
cohue commère compère complicité connivence consternation
contrariété convive cousinage crainte déconvenue dépit
désarroi désenchantement deuil discorde effusion émoi
engouement0 enthousiasme entrain envie épanchement épouvante
exaspération extase facétie0 fâcherie félicitation fiançailles
filleul fratrie frayeur frisson gêne grief hargne hilarité
inimitié jubilation lamentation langueur liesse marraine
mélancolie0 mépris mésentente nostalgie parentèle parrain
paroxysme pressentiment querelle rancoeur rancune ravissement
regret réjouissance remords repentir ressentiment rancart
sanglot saute0 soulagement stupeur tendresse tourment
tracas transport0 tristesse tumulte vexation
""".split()

# --------------------------------------------------------------------- #
# nouns — chemistry & materials
# --------------------------------------------------------------------- #

NOUNS_CHEMISTRY = """
acétone acétylène acide alcali alliage aluminium amalgame
ammoniac ammoniaque antimoine argon arsenic azote baryum
benzène bichromate borax brome butane calcium camphre
carbonate carbone caséine cellulose chlorate chlore chlorure
chrome cobalt colloïde combustion condensation corrosion
creuset cristallisation cyanure dilution dissolution distillation
ébullition électrolyse émanation émulsion éprouvette éther
évaporation fermentation filtrat fluor fusion0 gaz gélatine
glucose glycérine hélium hydrogène iode ion lithium magnésium
manganèse mercure0 méthane molécule naphtaline neutron nickel
nitrate oxyde oxygène ozone0 paraffine phosphore platine
plutonium polymère potasse potassium précipité propane proton
radium réactif résidu salpêtre silicium sodium solvant
soufre sublimation sulfate tungstène uranium vapeur zinc
""".split()

# --------------------------------------------------------------------- #
# -if / -al / -ique adjectives (second productive wave)
# --------------------------------------------------------------------- #

ADJS_IF_AL = """
abusif additif adhésif administratif adoptif affectif
agressif allusif applicatif approximatif associatif
attractif auditif augmentatif automnal baptismal
caritatif cérémonial0 collectif combatif comparatif compétitif
conclusif conflictuel congénital consécutif consultatif
contemplatif convulsif coopératif corporatif correctif corrosif
craintif0 cumulatif décisif décoratif défensif définitif
dégressif délibératif démonstratif dépressif dérisoire0
descriptif digestif directif dissuasif
distinctif dominical doctoral électoral émotif
estival évasif évolutif exclamatif exhaustif expansif
expéditif explétif explosif expressif facultatif0 fautif0
fédératif festif figuratif fiscal fluvial0 fugitif
furtif génital germinal glacial gouvernemental grammatical
guttural hâtif hiémal hivernal imaginatif imitatif impératif
impulsif inactif incisif inclusif indicatif inductif infinitif
informatif instinctif intempestif intensif interrogatif intuitif
inventif itératif jovial0 laudatif législatif lénitif lucratif
machinal maladif massif matinal médical médicinal méridional
monacal musical natal national négatif nominal nominatif
normatif nuptial objectif obsessionnel occasionnel
offensif olfactif originel ornemental paroissial partitif
pascal passif pastoral pénal pensif perceptif
plaintif pluvial portatif possessif postal précoce0 prédictif
préventif primitif processionnel productif progressif
prohibitif prospectif provincial prudentiel purgatif putatif
qualificatif quantitatif récessif récitatif récréatif rectal
récursif réflexif régional relatif rémunératif répétitif
répulsif restrictif rétif rétroactif rétrospectif rituel0
rural sculptural sensitif social spéculatif sportif
subjectif successif suggestif superlatif télévisuel tardif
tentaculaire théâtral thermal transitif tribal unitif
végétatif verbal vindicatif0 vocatif volitif zodiacal
""".split()

# ---------------------------------------------------------------------
# nouns — household objects, coins & measures, heraldry, riding,
# hunting, hardware, sounds (diff-filtered final tranche)
# ---------------------------------------------------------------------
NOUNS_OBJECTS = """
abat-jour0 accise accoudoir affiquet affût agrès aiguière alcarazas
aloi alpenstock alène amadou amble amure appeau aria armorial
assignat athanor aubère bagatelle bahut banco bardot batz bergère
besant bilboquet billon bitte blason bobsleigh bonbonnière
bonnetière boomerang borborygme bourriche braconnage bretèche
brouhaha burette bémol cabri caparaçon carafe carafon cargue
carnassière castine centime cerceau chantepleure chaudron chevrotine
cimier clameur clapotement clenche contrescarpe coupelle courtil
crampon crinière0 crissement croche croquet croupière cruche
crédence crémone crépitement curée denier destrier douve ducat
effigie escrime espagnolette estampage estrope ferrure filoir
fioriture flacon florin fléchette froufrou félibre galhauban
garcette gargouillement genette gibecière glacis0 gobelet gond
gonfanon grondement grésillement gueules guéridon halali hallali
haltère hameçon haquenée harnais herminette heurtoir hongre hourd
hululement itague jatte judas0 laize lambel lampion liard licou
limonier listel0 loquet maestria maillet mandrin manille0
margouillet merlon meurtrière meute monnayage moraillon mors0
mâchicoulis numéraire obole oriflamme orillon palefroi palet
paravent patin paumelle pennon penture percheron piastre picaillon
pichet pinceau piolet pistole poinçon pont-levis0 potiche poulinière
psyché pépiement pétanque quinquet rabatteur raquette ridoir riflard
ronronnement rosse roussin sabot0 saladier sape sapèque saucière
sautoir0 sellette semainier sesterce sinople sofa sol0 soupir0
soupière sous-ventrière0 stridulation surfaix suspente tanière
tapage taquet targette terrier thune tintamarre tintement tirelire
tolet toupie tremplin triolet trépied vacarme varappe veilleuse
verrou vénerie ébauchoir échiffre échiquier écu écuelle écusson
élingue étrier
""".split()

# ---------------------------------------------------------------------
# nouns — rhetoric, grammar, dances, arms & armour, instruments
# ---------------------------------------------------------------------
NOUNS_RHETORIC = """
abaque adverbe alidade allégorie antiphrase aphérèse apocope
apologue armet asana asyndète attribut auxiliaire aïkido badelaire
balancier banderille bandoulière bassinet0 branle0 braquemart
brassard camail catachrèse chanfrein charleston cimeterre
circonlocution claymore clepsydre col0 conjugaison contredanse
cotillon crête cubitière cuissard datif désinence enclise escopette
estoc fandango fleuret0 flexion0 forlane gnomon gorgerin gérondif
heaume hypotypose interjection locution loure micromètre
miséricorde0 morion nonius octant onomatopée palindrome parabole0
paradigme paronomase particule0 passepied pavois pierrier
planisphère pronom prosopopée préfixe prétérition quadrant rapière
redondance replat rigaudon rondache sablier solécisme spallière
subjonctif suffixe synérèse tarentelle tautologie trope ventaille
visière yatagan éboulement0 énallage épanorthose épenthèse
""".split()

# ---------------------------------------------------------------------
# adjectives — colour terms and bodily/material states
# ---------------------------------------------------------------------
ADJS_COLOR_STATE = """
acariâtre0 amarante ankylosé azuré beige benoît bourbeux carmin
châtain claudicant courroucé cramoisi craquelé doucereux déguenillé
déplumé engoncé ensommeillé esseulé fadasse0 fauve goûteux
gringalet0 grège guindé indigo isoclinal mauve mielleux0 ocre pers
pimpant0 pourpre racé revigoré rouillé rouquin succulent0 usagé
vermillon âcre0 ébahi éberlué ébréché éclopé écœurant édenté
égrotant éreintant
""".split()

# tail tranche: small objects, metal trades, liturgical vestments,
# jewellery — the last diff-filtered batch to reference scale
NOUNS_TAIL = """
accastilleur amict babiole bandonéon bonace bouillotte0 boulier
breloque calame camée cappa cartonnier chape0 chatoiement chrémeau
ciselure cloutier coffret cornue dalmatique damasquinure dressoir
encoignure entonnoir0 fanon filigrane formier férule girandole
grimoire huilier intaille jardinière0 joaillerie lormier mosette
moucheron0 nattier orfèvrerie pallium parure paumier plieur plumeau
porte-plume0 pèse-lettre0 ramasse-miettes0 rochet0 râtelier sceau
scriban sertissage sébile tabatière toilier tréfileur vide-poches0
étui
""".split()

# tail tranche 2: wild flora, waterbirds, petrology — replaces the
# volume lost when the fabricated derivations were culled
NOUNS_TAIL2 = """
alios alisma anatexite ansérine aplite bourdaine calament cargneule
cincle cinérite courvite diorite dolérite eupatoire fuligule gabbro
germandrée grauwacke guifette harle kimberlite lamier lherzolite
linaire lysimaque matricaire migmatite monzonite ophite orcanette
parisette pegmatite phonolite potamot pulicaire péridotite raiponce
rhyolite rousserolle sarcelle syénite tadorne tormentille trachyte
tussilage venturon verge0 éclogite égopode épiaire
""".split()


# tail tranche 3: household objects, garments, tools, weather and
# feeling nouns — authored diff-filtered against the built lexicon
NOUNS_TAIL3 = """
abattement accablement accalmie alanguissement alêne anorak balustre
bermuda besace bob boléro bouleversement boutoir brasero bédane
cache-pot cadenas cagoule calepin canisse canotier cendrier
chamboulement chasse-clou clayette cuvette doudoune dévidoir effroi
emballement espadrille ferveur gamelle gandoura gargoulette
girouette grattoir havresac jodhpurs lavabo lessiveuse liquette
loupiote mailloche mangeoire manivelle merlin morosité moulinet
nichoir nordet noroît paillasson panière pardessus peignoir pincette
porte-manteau potence presse-papier raclette rebord rifloir rince-
doigts salopette sarbacane serpillière serre-joint tisonnier
torchère tricorne tringle trousseau trusquin trébuchet vastringue
wassingue éblouissement égouttoir énervement épuisette étendoir
étourdissement
""".split()


# common attested adverbs whose base adjective is not inventoried
# (absolument, couramment-class) or that are primitive/temporal
# (jadis, dorénavant) — replaces the culled blanket derivation
ADVERBS_EXT2 = """
abruptement absolument abstraitement accessoirement affreusement
aisément allègrement approximativement arbitrairement assurément
astronomiquement aucunement autrefois autrement bellement bravement
brusquement bêtement carrément catégoriquement cependant chichement
combien comme concrètement continuellement contrairement
copieusement correctement crânement cérémonieusement dangereusement
derechef discrètement distinctement diversement doctement dorénavant
doublement drôlement décidément délibérément démesurément
déraisonnablement désespérément dûment effectivement efficacement
essentiellement exagérément exclusivement extrêmement farouchement
fermement fichtrement finalement forcément formellement fugitivement
férocement gratuitement guère immanquablement immédiatement
incontestablement indistinctement individuellement indubitablement
indéfiniment indûment inexorablement inopinément insensiblement
instantanément intégralement intérieurement invariablement
inversement isolément jadis lors lourdement majoritairement
manifestement médiocrement mêmement naguère notamment nécessairement
obstinément officieusement parcimonieusement pareillement
passablement passagèrement passionnément physiquement populairement
postérieurement potentiellement pourtant premièrement
prodigieusement progressivement proportionnellement provisoirement
préalablement précairement préférablement prétendument quasiment
rageusement réciproquement rétroactivement rétrospectivement
sciemment scrupuleusement secondairement secrètement sensément
simultanément singulièrement sommairement souterrainement
spontanément sporadiquement subrepticement subsidiairement
substantiellement succinctement supérieurement séparément sûrement
temporairement toutefois typiquement ultérieurement uniment
vaguement virtuellement volontairement volontiers vraisemblablement
""".split()


# expressive / colloquial-register -er verbs (all dictionary words),
# authored diff-filtered against the built lexicon
VERBS_ER_EXPRESSIVE = """
ankyloser attabler bagarrer balafrer ballotter baratiner barboter
barioler bassiner besogner bichonner blackbouler boudiner
bourlinguer brigander briguer cafouiller canarder cartonner
castagner cauchemarder chamailler chapeauter charcuter cocooner
colmater commanditer compartimenter concocter contrecarrer débobiner
débroussailler décamper décoiffer déconner décortiquer dégommer
détaler emberlificoter embrigader embroussailler empester empiffrer
emplafonner encanailler enguirlander enquiquiner entrechoquer
esquinter fainéanter farfouiller flancher fouiner fourguer gaffer
galvauder godiller gratouiller lésiner nasiller noyauter ornementer
pigeonner planquer plastronner plébisciter péricliter rançonner
rapetisser ratiboiser rechigner recroqueviller regimber rempiler
renauder rengainer ripoliner récolter réglementer rôdailler saborder
seriner squatter surnager tarabuster toiletter tournicoter
traficoter tripatouiller valdinguer vivoter écharper écorcher
éparpiller épauler étriller
""".split()
