"""Round-5 lexicon extension: more curated lemmas, same morphology.

The reference targets a ~130k-type lexicon
(``/root/reference/java/alix/lucene/analysis/FrDics.java:82-83``); the
round-4 generated lexicon reached ~33k inflected forms from ~1,800
lemmas. This module roughly doubles the lemma inventory — ~1,000
additional common French verbs (grouped by the spelling families
``fr_lexicon.conjugate_er`` implements), ~60 second-group verbs, and a
few hundred nouns/adjectives — still authored from public-knowledge
vocabulary and expanded by the textbook inflection rules in
``fr_lexicon``. Kept as a sibling module so each inventory file stays
reviewable; ``fr_lexicon.build_lexicon`` consumes both.

Marker conventions (shared with fr_lexicon): trailing ``1`` = è-type
mute-e stem (acheter/geler family), ``2`` = consonant-doubling
(appeler/jeter family), ``3`` = é→è stem (préférer family), ``0`` =
plain homograph/duplicate disambiguator.
"""

from __future__ import annotations

# --------------------------------------------------------------------- #
# 1st-group verbs
# --------------------------------------------------------------------- #

# -iser / -ifier derivational families
VERBS_ER_ISER = """
actualiser alphabétiser banaliser brutaliser canaliser capitaliser
centraliser décentraliser cicatriser climatiser coloniser décoloniser
commercialiser concrétiser cristalliser culpabiliser démocratiser
démoraliser désorganiser dévaloriser revaloriser dramatiser
dédramatiser dynamiser économiser électriser évangéliser familiariser
fertiliser finaliser formaliser fraterniser globaliser harmoniser
hospitaliser humaniser déshumaniser hypnotiser idéaliser immobiliser
immuniser individualiser industrialiser informatiser insonoriser
ironiser légaliser marginaliser matérialiser maximiser minimiser
militariser monopoliser moraliser motoriser nationaliser naturaliser
neutraliser personnaliser polariser populariser privatiser
rationaliser relativiser ridiculiser rivaliser scandaliser scolariser
sécuriser sensibiliser signaliser socialiser solidariser spécialiser
stabiliser déstabiliser standardiser stigmatiser sympathiser
synchroniser systématiser terroriser totaliser tranquilliser
traumatiser uniformiser urbaniser vandaliser vaporiser verbaliser
visualiser vulgariser galvaniser automatiser carboniser fragiliser
improviser pulvériser subtiliser temporiser théoriser titulariser
amplifier béatifier bonifier clarifier classifier codifier crucifier
diversifier édifier électrifier exemplifier falsifier fortifier
glorifier gratifier horrifier humidifier intensifier liquéfier
momifier mystifier notifier pacifier personnifier pétrifier planifier
purifier qualifier disqualifier quantifier ramifier ratifier rectifier
sacrifier sanctifier solidifier spécifier terrifier unifier versifier
vivifier lubrifier plastifier
"""

# -onner family
VERBS_ER_ONNER = """
abandonner actionner additionner ambitionner auditionner bâillonner
bétonner boutonner déboutonner bourgeonner braconner chantonner
collectionner conditionner confectionner coordonner cautionner
dimensionner échantillonner empoisonner emprisonner environner
espionner étonner fanfaronner fonctionner fractionner frictionner
fusionner gazonner griffonner harponner impressionner klaxonner
mentionner moissonner occasionner ordonner papillonner pardonner
passionner perfectionner positionner questionner raisonner rayonner
réceptionner résonner révolutionner sanctionner savonner sélectionner
sermonner sillonner soupçonner stationner subventionner tamponner
tâtonner tourbillonner tronçonner bourdonner couronner jalonner
perquisitionner réquisitionner sectionner
"""

# everyday regular -er verbs (part 1)
VERBS_ER_COMMON_A = """
accompagner accrocher décrocher accumuler admirer affirmer agiter
ajouter alerter aligner alimenter allier animer apporter approcher
approuver arracher aspirer assister assurer attacher attaquer attirer
augmenter baigner blaguer blâmer boiter bosser boucher boucler bouder
bousculer brancher débrancher briser brûler cacher calmer camper
capturer cerner chauffer chuchoter circuler citer coiffer colorer
colorier combiner commenter comparer compenser compter conjuguer
consacrer conseiller consister constater consulter contacter
contempler contester contrôler converser coucher couler coûter
cracher craquer croiser cumuler dater déballer débuter décaler
déchirer déclarer décoller dégoûter déguiser délivrer dépenser
dessiner détacher détester détourner développer deviner dicter
diffuser discuter disputer distinguer doubler douter durer échapper
éclairer éclater effondrer égarer embrasser emporter emprunter
encadrer enchanter enfermer enfiler enflammer enregistrer entourer
entraîner envelopper épouser éprouver équiper errer estimer étaler
étouffer évacuer éviter examiner exciter exister expédier exploiter
exprimer fâcher faciliter fatiguer fêter figurer filer filmer fixer
flotter formuler fouiller fréquenter frotter fusiller galoper garer
gaspiller gêner gifler gonfler graver grignoter grogner guider
habiller hésiter honorer hurler illustrer imaginer imiter incarner
inciter incliner insister inspirer insulter intéresser inventer jurer
kidnapper lâcher limiter livrer louper lutter manifester manipuler
manquer masser méditer mériter mesurer militer murmurer naviguer
noter numéroter occuper opter orner ôter parier participer patiner
pencher percuter perturber piloter piquer précipiter préciser
présider prêter prier procurer profiter prouver publier puiser quêter
râler ramer ramper raser rassembler rassurer rater rattraper
récompenser réconforter reculer redouter régaler regretter relier
rembourser remonter remporter rencontrer renseigner rentrer renverser
répliquer reprocher respecter respirer ressembler retourner retrouver
réveiller rigoler rimer rôder ronfler rouler ruiner ruminer saboter
saigner sangloter sauver savourer scier sculpter séjourner séparer
serrer siffler signaler signer simuler soigner sonner souhaiter
souligner soupirer sursauter survoler tacher tailler taper tapisser
taquiner témoigner tenter terminer timbrer tisser tousser traîner
traiter trembler tremper tricher tricoter triompher tromper troquer
trotter troubler vaciller vanter veiller verrouiller vexer vibrer
vider viser voler vouer zapper zigzaguer
"""

# everyday regular -er verbs (part 2)
VERBS_ER_COMMON_B = """
abriter absorber accabler acclamer accommoder accoster accoucher
adopter affronter agrafer aiguiser ajuster alarmer allaiter allouer
alterner amarrer amputer ancrer annuler anticiper apaiser apprivoiser
appréhender arbitrer archiver armer arpenter articuler assassiner
assembler assimiler assumer ausculter avaler aviser bâcler bafouer
balader basculer berner beugler biaiser bifurquer blinder borner
botter bouffer bouleverser bouquiner bourrer boxer boycotter brader
brailler braquer brasser bredouiller bricoler brider brimer broder
bronzer brouiller buter butiner cabosser cadrer cajoler caler
calibrer câliner calligraphier calquer cambrioler camoufler capituler
capoter capter caricaturer cataloguer catapulter ceinturer censurer
centrer chahuter charmer charrier châtier chatouiller chausser
chavirer cheminer chiffrer déchiffrer chuter cibler cimenter cirer
clamer claquer cligner clignoter clôturer cocher coexister cogner
cohabiter collaborer collecter combler commémorer comploter comporter
comprimer concentrer concerner concerter condamner confirmer conjurer
connecter déconnecter consoler consolider conspirer contaminer
contenter contourner contracter contrarier contraster convoiter coter
cotiser courtiser créditer cribler crisper culbuter culminer déambuler
débarrasser débrouiller décimer dédier défier défiler défricher
dégonfler dégringoler déjouer délimiter démarrer démêler démonter
dénicher dépanner dépayser dépister déplorer déprimer déraciner
dérailler dérober dérouler désarmer déserter désigner désinfecter
destiner détailler détecter déterrer dévaster dévisager dévoiler
dialoguer dilater diluer discerner discipliner disperser dissimuler
dissiper distiller divaguer divulguer domestiquer dominer dompter
doser dribbler duper dynamiter écarter échauffer éclabousser écoeurer
égaler égoutter élaborer électrocuter éliminer éloigner emballer
embaucher emboîter embrouiller émerveiller émigrer emmêler empêcher
empiler encaisser encercler enchaîner encombrer engouffrer enjamber
enlacer enquêter enrhumer enrouler ensabler enseigner entamer
enterrer entonner entreposer envier épargner épater épier épingler
éponger escalader esquisser esquiver essouffler estomper étirer
étrangler évaporer éveiller exalter exhiber exhorter exiler expulser
exulter fabuler faner fasciner faucher fausser féliciter ficher
fignoler filtrer flairer flamber flatter flirter foisonner fomenter
fourmiller fracasser frissonner froisser frôler fulminer fuser
gambader gaver gazouiller gesticuler gicler glaner gouverner graviter
greffer grelotter griffer grimper grouiller guetter happer hanter
hiberner hisser hocher humecter humilier hydrater immigrer immoler
implanter importuner inaugurer incendier incruster inculquer infecter
infester infiltrer innover inspecter instaurer intercaler intercepter
intimider intituler intriguer inverser irriguer irriter isoler
jardiner jongler jubiler juxtaposer labourer lambiner lasser laver
lézarder licencier ligoter liquider lisser loucher majorer maltraiter
manoeuvrer maquiller marchander massacrer matraquer mêler menotter
miauler mimer miner miroiter mitrailler moucher mouiller mouler muter
mutiler narguer narrer nicher nier obliquer obstruer occulter
offusquer onduler opprimer orbiter orchestrer orienter osciller
oxyder pactiser paniquer panser parachuter parader paralyser
paraphraser parfumer parrainer patienter pavaner paver peaufiner
pédaler peigner peiner percher perforer périmer permuter persécuter
persister pétiller piétiner piller pivoter placarder plafonner
plaider plaisanter planer planter plâtrer plisser pomper ponctuer
postuler potasser pourchasser préfacer présumer prétexter primer
prohiber promulguer prospecter protester psalmodier quadriller
quereller raboter raccommoder raccompagner racler radoter raffiner
raffoler rafler railler rajouter rapatrier râper rapporter rapprocher
raturer ravitailler réadapter réaffirmer réanimer rebrousser récurer
recenser recopier recruter redoubler rééduquer refouler réfuter
regrouper réhabiliter réincarner relater remanier rembobiner remédier
renflouer renifler rénover rentabiliser répertorier reporter
représenter réprimander réprimer répudier résider résigner résilier
résister résorber ressasser ressusciter restaurer restituer résulter
résumer retaper retrancher rétorquer rétracter réveillonner révolter
ricaner rider roder sacrer saliver saturer sautiller sceller scinder
scintiller scruter segmenter séquestrer singer siroter skier
solliciter sombrer sommeiller somnoler souffler souiller spéculer
stagner stimuler stipuler stopper strier subsister succomber
suffoquer suinter supplier supporter surcharger surestimer surfer
surmonter surnommer surpasser surplomber surveiller susciter
suspecter susurrer tabasser tambouriner tamiser tanguer tapoter
tarauder tartiner tasser tâter tatouer teinter télécommander
téléguider tenailler tergiverser titiller toiser tonner torpiller
torturer tracasser trafiquer trancher transgresser transiter
transpirer transplanter transporter traquer trébucher trépigner
tresser trinquer tripler triturer tronquer truquer vacciner
vagabonder vaguer valser véhiculer ventiler violer virevolter
visionner voguer voiler voisiner voûter vriller zoner
"""

# -ger / -cer verbs (automatic spelling adjustment, no marker needed)
VERBS_ER_GER_CER = """
héberger émerger immerger submerger asperger converger diverger
purger égorger forger vendanger démanger vidanger outrager enneiger
neiger piger figer fustiger endommager ménager emménager aménager
saccager enrager propager déroger abroger rédiger ériger infliger
affliger mitiger voltiger adjuger préjuger méjuger ravager présager
jauger patauger rallonger replonger rager gager
commencer recommencer devancer financer enfoncer défoncer dénoncer
énoncer balancer élancer relancer grincer amorcer exaucer replacer
espacer agencer influencer référencer nuancer sucer agacer foncer
épicer
"""

# è-type mute-e stems (geler family) — marker 1
VERBS_ER_F1 = """
geler1 congeler1 dégeler1 surgeler1 modeler1 peler1 marteler1
ciseler1 démanteler1 racheter1 haleter1 crocheter1 fureter1 déceler1
receler1 grever1 sevrer1 soupeser1 parsemer1 malmener1 surmener1
démener1 prélever1 harceler1 parachever1
"""

# consonant-doubling (appeler/jeter family) — marker 2
VERBS_ER_F2 = """
ficeler2 morceler2 niveler2 ruisseler2 étinceler2 atteler2 dételer2
ensorceler2 museler2 amonceler2 chanceler2 grommeler2 cliqueter2
voleter2 caqueter2 hoqueter2 becqueter2 breveter2 épousseter2
pelleter2 empaqueter2
"""

# é→è stems (préférer family) — marker 3
VERBS_ER_F3 = """
aérer3 altérer3 blasphémer3 coopérer3 décéder3 décréter3 dégénérer3
délibérer3 désespérer3 désintégrer3 différer3 exaspérer3 fédérer3
générer3 incinérer3 insérer3 intégrer3 lacérer3 lécher3 modérer3
obséder3 oblitérer3 persévérer3 pondérer3 proliférer3 prospérer3
récupérer3 référer3 refléter3 régénérer3 régner3 réitérer3 rémunérer3
repérer3 révérer3 sidérer3 tempérer3 transférer3 vénérer3 vociférer3
zébrer3 adhérer3 concéder3 procéder3 excéder3 accéder3 intercéder3
perpétrer3 empiéter3 alléger3 abréger3 agréger3 siéger3 assiéger3
piéger3 rapiécer3 rouspéter3 sécréter3 vitupérer3 végéter3 imprégner3
chronométrer3 héler3 réintégrer3 reléguer3
"""

# -oyer / -uyer / -ayer (automatic y→i, no marker needed)
VERBS_ER_YER = """
zézayer frayer défrayer enrayer étayer monnayer pagayer remblayer
festoyer flamboyer foudroyer guerroyer larmoyer ondoyer ployer
rudoyer tournoyer verdoyer apitoyer chatoyer convoyer coudoyer
dévoyer fourvoyer louvoyer poudroyer rougeoyer soudoyer
"""

VERBS_ER_EXT = " ".join(
    [
        VERBS_ER_ISER,
        VERBS_ER_ONNER,
        VERBS_ER_COMMON_A,
        VERBS_ER_COMMON_B,
        VERBS_ER_GER_CER,
        VERBS_ER_F1,
        VERBS_ER_F2,
        VERBS_ER_F3,
        VERBS_ER_YER,
    ]
).split()

# --------------------------------------------------------------------- #
# 2nd-group (-iss-) verbs
# --------------------------------------------------------------------- #

VERBS_IR2_EXT = """
abrutir affermir agrandir aguerrir amincir amortir anéantir aplatir
asservir assombrir assortir assouplir attendrir blêmir bleuir blottir
brandir chérir compatir croupir dégarnir démunir dépérir éclaircir
emboutir endurcir enfouir engloutir engourdir enhardir épanouir
étourdir faiblir farcir fléchir flétrir garnir intervertir languir
meurtrir moisir munir obscurcir périr raidir rafraîchir ragaillardir
ramollir refroidir resplendir ressaisir retentir réagir roussir sévir
tarir ternir tiédir vernir vrombir ensevelir rancir racornir hennir
""".split()

# --------------------------------------------------------------------- #
# 3rd-group regular -re (vendre type)
# --------------------------------------------------------------------- #

VERBS_RE_EXT = """
épandre répandre redescendre refondre retendre distendre
""".split()

# --------------------------------------------------------------------- #
# nouns and adjectives
# --------------------------------------------------------------------- #

NOUNS_EXT = """
abri accès accord acier acteur actrice adresse affiche agriculture
aide aiguille aile alarme album alcool alimentation allée allure
ambiance ambition amitié amour ampoule analyse ancre angle angoisse
anneau annonce annuaire apparence appareil appartement appel appétit
apprentissage approche architecte architecture ardoise argile
argument armée armoire arôme arrêt arrivée ascenseur aspect assiette
association assurance atelier athlète atmosphère attaque attente
attention attitude aube auberge audace augmentation auteur autobus
automobile autorité autoroute avalanche avance avantage avenir
aventure averse aveu avion avis avocat bagage bague baguette baie
baignoire bain baiser balade balai balance balcon banc bande banlieue
banquet banquier barbe barque barrage barrière bataille bateau
bâtiment bâton beauté bec béquille berceau besoin bêtise béton
bicyclette bidon bienfait bijou bilan billard blague blessure bloc
blouse bocal bois boisson boîte bonbon bonheur bonnet bord bordure
bosse botte bouchon boucle boue bouée bougie boulanger boulangerie
boule boulevard bouquet bourse boussole bout bouteille bouton
brasserie brebis brique briquet brise brochure broderie brouillard
bruit brûlure brume budget buffet buisson bulle bulletin but cabane
cabine cadeau cadre cahier caisse calcul calendrier camion campagne
canal canapé capitaine capitale caprice capuchon caractère cargaison
carnet carreau carrefour carrière carton cascade casque casserole
catastrophe cause caverne ceinture cendre centre cercle cérémonie
chagrin chaîne chaleur chance chandelle changement chanson chantier
chapeau chapelle chapitre charbon charge charme charpente chasse
chaussée chaussette chaussure chef chemin cheminée chemise chêne
chèque chiffon chiffre choc choix chute cible cicatrice cime ciment
cirque ciseau citation citoyen civilisation clarté classe clavier
clé client climat cloche clou club code coffre coiffure coin colère
colis collection collège colline colonne combat comédie commande
commencement commerce commissaire commode compagnie comparaison
compartiment complice compliment comportement compositeur compte
comptoir concert concours condition conducteur conférence confiance
conflit confort congrès connaissance conquête conseil consigne
consommation construction conte contenu continent contrat contrôle
conversation copie coquille corbeille corde corne corps
correspondance côte coton couche couleur couloir coup courage
courant courrier course coussin couteau coutume couverture crainte
crayon création créature crédit crème crêpe cri crime crise cristal
critique croissance croix cruauté cuillère cuir culture curiosité
cycle danger débat début décision déclaration décor découverte
défaite défaut défense définition degré délai demande démarche
demeure demoiselle dent dentelle départ dépense désastre descente
description désert0 désir désordre dessert destin détail dette deuil
devise devoir diamant dictionnaire différence difficulté dignité
dimension diplôme direction discipline discours discussion
disparition disque distance distraction document domaine dommage don
dossier douane douceur douche douleur doute dragon drame drap
drapeau droite durée eau échange échantillon échelle écho éclair0
éclat école économie écorce écran écriture écrivain effet effort
église élan élection électricité élégance éléphant élève éloge
embarras émission émotion empereur emploi employé emprunt encre
endroit énergie enfance engin énigme enquête enseignement ensemble0
enthousiasme entrée entretien enveloppe envie épaisseur épée épice
épidémie épisode époque épreuve équilibre équipage équipe erreur
escalier esclave espace espèce espérance espoir esprit essai essence
estomac étage étagère étang état étendue étincelle étoffe étonnement
étude événement éventail évidence évolution examen excuse exemple
exercice existence expérience explication exploit explosion
exposition expression extrait fabrique façade face facteur facture
faiblesse falaise farine fatigue faute fauteuil faveur ferme0
fermeture feuillage fibre ficelle fierté fièvre figure fil file
filet fin0 flamme flèche fleuve flot foi foire fonction fondation
fontaine force formation forme formule fortune fossé foule four
fourchette fourrure foyer fracas fraction fraîcheur frontière fruit
fuite fumée fureur fusée fusil gain galerie gant garage garantie
garde gardien gazon gelée gendarme génération génie genre
gentillesse géographie geste gibier gloire gorge goutte gouvernement
grain graine graisse grandeur grange gravure grenier grève griffe
grillage grimace grippe grotte groupe guerre guichet guide guitare
habitant habitude hache haie haine hasard hauteur hébergement
hérisson héritage héros hésitation honneur honte horaire horizon
horloge hospitalité hôtel huile humanité humeur humour hymne idéal
idée identité île illusion illustration imagination immeuble
impatience importance impression incendie incident indication
industrie infirmière influence information ingénieur innocence
inondation inquiétude inscription installation institut instruction
instrument insulte intelligence intention intérêt intérieur0
interruption intervalle invention invitation issue jalousie
jardinier jeunesse joie jouet0 journée jugement jument jupe justice
""".split()

ADJECTIVES_EXT = """
absent0 absurde actif0 admirable0 adorable adroit affectueux agile
aimable0 amical ambitieux annuel anonyme applicable apte astucieux
atroce authentique automatique autonome banal bavard bienveillant
blafard blême brutal captif chaleureux chétif clandestin classique
coléreux collectif comestible comique compétent concis confortable
confus conscient considérable constant contagieux continu convenable
cordial costaud courtois coûteux crédule critique0 crucial décent
décisif dédaigneux défectueux définitif délicat dense désespéré
désinvolte désolé diffus digne diligent direct distinct dominant
douillet doué dramatique dynamique efficace égoïste élémentaire
éloquent émouvant énergique enjoué entêté enthousiaste épatant
éphémère épuisant équitable étourdi0 éventuel évident exact excessif
exigeant exotique explicite exquis extérieur extrême fameux familial
familier fatal fécond ferme0 fervent fictif flagrant flou fluide
fonctionnel fondamental fougueux frénétique fréquent frugal fugitif
furtif futile galant glacial global glorieux gourmand graduel
grandiose grossier habituel hargneux hautain hebdomadaire hermétique
hésitant hideux hilarant hostile humide0 identique illégal illustre
imminent immobile impartial impatient impeccable impératif implicite
impulsif inapte incertain inconscient incorrect incroyable indécis
indemne indifférent indigne indirect indulgent inédit inerte
inévitable infini infime ingrat inhabituel inlassable innocent inouï
inquiétant insolite instable intact intègre intense intime inutile0
irréel jovial judicieux juteux latent légal légitime lisible littéral
logique loyal lucide lugubre luisant luxueux machinal majestueux
maladif malicieux manuel marginal massif maternel méfiant
mélancolique mensuel méticuleux minutieux miséreux mobile momentané
mondial monotone monstrueux monumental moqueur morose mortel mouvant
multiple municipal musclé mystérieux naïf natal néfaste négatif
négligent net nocturne nomade notable notoire nuisible nul
obligatoire oblique obstiné occasionnel odieux officiel opportun
opulent oral orageux ordonné original ovale paisible partial
passager passionnant paternel pathétique patient perpétuel perplexe
persévérant personnel persuasif pertinent pesant pessimiste piquant
pittoresque plaintif plausible poignant ponctuel populaire portatif
positif postal potable potentiel précaire précis précoce présumé
préventif primitif primordial probable prodigieux productif profane
professionnel profitable prompt prospère provisoire puéril puissant
quotidien radical radieux rationnel ravissant réceptif réciproque
rectangulaire redoutable réfléchi régulier relatif rentable résolu
respectable resplendissant responsable restreint rêveur rigoureux
risible rituel rocheux romanesque rudimentaire rusé rustique sacré
sanglant satisfaisant sceptique scolaire séculaire sensationnel
sentimental serein significatif sinistre sobre soigneux solennel
solitaire somptueux soucieux souriant spacieux spécial spectaculaire
spontané sportif stable strict studieux subtil successif succinct
suprême suspect symbolique sympathique talentueux tardif tenace
textuel théorique timide tolérant torride touchant touffu toxique
traditionnel tragique turbulent ultime unanime uniforme universel
urgent usuel vague0 vaillant0 vain valable véhément véritable
vertical vétuste vigilant vigoureux virtuel vital vorace vulnérable
zélé
""".split()

# --------------------------------------------------------------------- #
# round-5b: thematic verb batch (maritime, law/commerce, medicine,
# religion, crafts, cooking, emotion, military, weather/nature,
# technology, movement) — same family-marker conventions
# --------------------------------------------------------------------- #

VERBS_ER_THEMATIC = """
abdiquer abjurer abonner acclimater accoler acculer aduler administrer
affaisser affaler affecter afficher affiler affilier affiner affleurer
affluer affoler affubler agglutiner aggraver agoniser agrémenter
agripper aimanter ajourner amadouer ameuter amidonner amnistier amocher
anesthésier angoisser annexer annihiler antidater apeurer appareiller
apparenter appâter approvisionner arrimer aseptiser asphyxier astiquer
atomiser attenter atténuer attester attrouper augurer auréoler avaliser
aveugler aviver axer caboter chevaucher écoper flâner gréer haler
randonner remorquer vadrouiller
facturer comptabiliser budgétiser exproprier indemniser acquitter
gracier écrouer statuer parapher contresigner débouter taxer frauder
resquiller escroquer extorquer
transfuser perfuser intuber diagnostiquer suturer interner
radiographier inoculer
communier canoniser excommunier prophétiser exorciser
élaguer biner sarcler pailler drainer engranger ferrer limer poncer
visser boulonner charpenter maçonner goudronner bitumer asphalter
échafauder ravaler badigeonner décaper lessiver
rissoler braiser pocher gratiner paner mariner infuser malaxer émincer
essorer écosser dénoyauter épépiner zester aromatiser pimenter sucrer
édulcorer réchauffer glacer napper fourrer enfourner
idolâtrer abhorrer jalouser dédaigner snober réconcilier complimenter
encenser dénigrer calomnier diffamer offenser injurier invectiver
épouvanter enthousiasmer enjôler fiancer
batailler canonner déminer exterminer bivouaquer patrouiller
démobiliser enrôler incorporer démilitariser réarmer riposter
grêler venter bruiner givrer verglacer condenser ombrager germer
fructifier enraciner polliniser essaimer hiverner migrer nidifier
couver picorer roucouler pépier croasser hululer japper meugler bêler
coasser
numériser digitaliser scanner photocopier imprimer faxer texter
crypter décrypter encoder décoder formater défragmenter compresser
décompresser téléverser pirater bloguer poster flasher zoomer
pixelliser étalonner initialiser réinitialiser désinstaller robotiser
mécaniser
déraper tituber pirouetter agenouiller contorsionner frétiller gigoter
piaffer caracoler trottiner faufiler slalomer sprinter freiner
hypothéquer3 exonérer3 incarcérer3 légiférer3 macérer3 pécher3
agglomérer3 aliéner3 allécher3 alléguer3 assécher3 affréter3 exécrer3
paramétrer3 riveter2 carreler2 décongeler1 atermoyer
""".split()

VERBS_IR2_THEMATIC = """
bénir pétrir ahurir amaigrir amerrir anoblir aplanir assagir assouvir
avilir aboutir reverdir barrir accroupir
""".split()

# --------------------------------------------------------------------- #
# round-5b: noun and adjective batch (animals, plants, materials, body,
# clothing, kitchen, tools, abstractions)
# --------------------------------------------------------------------- #

NOUNS_THEMATIC = """
kilomètre kilo gramme litre mètre centimètre tonne douzaine moitié
quart tiers majorité minorité totalité ensemble quantité nombre somme
laboratoire expérience0 théorie hypothèse preuve démonstration formule0
équation géométrie algèbre chimie biologie astronomie planète
comète météore galaxie univers atome molécule cellule organisme microbe
bactérie virus vaccin remède médicament ordonnance piqûre pansement
fracture entorse brûlure0 fièvre0 toux rhume grippe0 angine migraine
vertige nausée symptôme diagnostic chirurgie clinique pharmacie
infirmerie ambulance brancard
loup0 renard0 ours0 cerf0 biche chevreuil sanglier0 lièvre blaireau
belette fouine hermine loutre castor marmotte écureuil hérisson0
taupe musaraigne chauve-souris0 phoque morse otarie narval béluga
panthère léopard guépard lynx jaguar puma tigre lion lionne tigresse
éléphant0 rhinocéros hippopotame girafe zèbre antilope gazelle gnou
buffle bison yak chameau dromadaire lama alpaga singe gorille
chimpanzé orang-outan0 babouin lémurien tatou fourmilier
kangourou koala wombat ornithorynque autruche émeu casoar kiwi
pélican flamant héron cigogne grue0 ibis spatule cormoran frégate
albatros pétrel mouette goéland sterne macareux pingouin manchot
perroquet perruche cacatoès toucan colibri martinet hirondelle
rossignol fauvette mésange pinson chardonneret bouvreuil verdier
alouette grive merle étourneau geai pie corneille choucas vautour
condor faucon épervier autour buse milan busard chouette hibou effraie
grand-duc0 coucou huppe pivert sittelle grimpereau troglodyte roitelet
anguille carpe brochet perche0 sandre silure gardon ablette tanche
goujon barbeau épinoche esturgeon lamproie sole turbot limande
cabillaud morue églefin merlan lieu0 colin maquereau hareng sardine
anchois thon espadon marlin dorade bar0 mulet0 rouget rascasse murène
congre raie0 torpille0 hippocampe méduse corail anémone éponge étoile0
oursin concombre0 crabe tourteau étrille homard langouste langoustine
crevette gambas écrevisse bernard-l'ermite0 bigorneau bulot patelle
moule0 palourde coque0 praire huître pétoncle coquille0 seiche calmar
poulpe nautile limace
chêne0 hêtre charme0 frêne orme érable tilleul peuplier tremble saule
aulne bouleau noyer0 châtaignier marronnier platane acacia robinier
cèdre sapin épicéa mélèze pin0 cyprès if genévrier houx buis laurier
olivier figuier amandier pêcher0 abricotier prunier cerisier pommier
poirier cognassier néflier sorbier sureau noisetier cornouiller
aubépine prunellier églantier ronce framboisier groseillier cassissier
myrtille airelle canneberge genêt bruyère ajonc fougère prêle mousse0
lichen algue varech roseau jonc carex massette nénuphar lotus iris0
jonquille narcisse tulipe jacinthe crocus perce-neige0 primevère
violette0 pensée0 myosotis pâquerette marguerite bleuet coquelicot
pavot chardon centaurée scabieuse campanule digitale gentiane
edelweiss orchidée oeillet silène saponaire valériane camomille
achillée tanaisie armoise absinthe estragon basilic thym romarin
sauge menthe mélisse verveine origan marjolaine sarriette cerfeuil
persil coriandre aneth fenouil cumin carvi anis angélique livèche
oseille épinard bette poireau céleri panais navet radis rutabaga
topinambour salsifis cardon artichaut asperge courgette aubergine
poivron piment potiron citrouille courge melon pastèque concombre
cornichon fève lentille0 pois0 soja arachide sésame tournesol colza
lin0 chanvre houblon seigle orge avoine millet sorgho sarrasin
quinoa épeautre maïs riz0
acier0 fonte0 fer0 cuivre bronze laiton étain plomb zinc nickel
chrome titane aluminium magnésium mercure0 argent0 or0 platine
tungstène uranium soufre phosphore carbone silicium calcium sodium
potassium azote oxygène hydrogène hélium néon argon chlore fluor iode
granit basalte calcaire grès0 marbre ardoise0 schiste silex quartz
mica feldspath gypse craie argile0 kaolin tourbe lignite houille
anthracite pétrole bitume goudron asphalte ciment0 béton0 plâtre
chaux mortier brique0 tuile parpaing moellon pavé gravier gravillon
galet caillou
""".split()

ADJECTIVES_THEMATIC = """
métallique minéral0 végétal0 organique chimique0 atomique nucléaire
électronique numérique analogique mécanique0 hydraulique pneumatique
thermique solaire éolien lunaire planétaire stellaire cosmique
terrestre maritime fluvial lacustre côtier montagneux vallonné
désertique aride0 tropical équatorial polaire0 continental insulaire
urbain rural champêtre agricole forestier boisé herbeux fleuri
verdoyant0 ombragé ensoleillé pluvieux neigeux brumeux nuageux venteux
orageux0 glacé0 gelé brûlant0 torride0 caniculaire tempéré clément
rigoureux0 inclément
comptable fiscal bancaire monétaire financier commercial industriel
artisanal agraire foncier immobilier locatif salarial patronal
syndical contractuel statutaire réglementaire législatif judiciaire
pénal civique électoral parlementaire ministériel préfectoral
communal départemental provincial fédéral constitutionnel
diplomatique consulaire douanier militant pacifiste belliqueux
stratégique tactique offensif défensif frontalier colonial impérial
monarchique républicain démocratique aristocratique féodal seigneurial
princier ducal comtal papal épiscopal paroissial monastique conventuel
liturgique sacerdotal séculier laïque pieux dévot mystique prophétique
angélique céleste infernal démoniaque païen profane0 sacrilège
blasphématoire
anatomique musculaire osseux nerveux0 sanguin cardiaque pulmonaire
digestif intestinal hépatique rénal dermique capillaire oculaire
auditif olfactif tactile gustatif vocal buccal dentaire nasal frontal
crânien cérébral spinal articulaire squelettique glandulaire hormonal
immunitaire viral bactérien microbien parasitaire contagieux0
épidémique chronique aigu0 bénin0 malin1 opératoire postopératoire
thérapeutique curatif palliatif préventif0 clinique0 ambulatoire
stérile0 aseptique antiseptique anesthésique
soyeux0 cotonneux laineux duveteux feutré satiné moiré chatoyant
rayé quadrillé fleuri0 imprimé brodé tissé tricoté matelassé doublé
ourlé plissé froncé drapé ajusté cintré évasé moulant0 ample étriqué
élimé rapiécé reprisé déchiré0 effiloché
croustillant moelleux fondant onctueux crémeux mousseux pétillant
gazeux plat0 éventé corsé capiteux fruité boisé0 épicé0 poivré
vanillé caramélisé grillé0 rôti fumé0 mariné saumuré confit givré0
glacé1 tiède0 brûlant1 réchauffé rassis frais1 avarié rance moisi
fermenté
""".split()

# --------------------------------------------------------------------- #
# round-5c: final batch — school/music/sport/household/communication/
# finance/emotion/time/nature/care verbs, pronominal-typical verbs,
# and verb-derived nominalizations
# --------------------------------------------------------------------- #

VERBS_ER_FINAL = """
bachoter plancher disserter éduquer fredonner siffloter désaccorder
pianoter vocaliser bluffer distancer lober plaquer tacler désencombrer
défroisser détartrer dégraisser décrasser ramoner rempoter désherber
composter recycler argumenter objecter marmonner bafouiller zozoter
égosiller monologuer papoter jacasser cancaner consterner atterrer
effarer stupéfier méduser désarçonner chambouler décontenancer
repousser perdurer éterniser écourter pérenniser expirer inventorier
serpenter cascader dégouliner déferler refluer clapoter moutonner
bouillonner épiler démaquiller pomponner manucurer déguster goinfrer
bâfrer jeûner souper méfier soucier évertuer exclamer écrier
prosterner esclaffer lamenter rebeller réfugier suicider vautrer
insurger thésauriser boursicoter dilapider provisionner défiscaliser
dévaluer réévaluer
commérer3 rasséréner3 décacheter2 banqueter2
""".split()

VERBS_IR2_FINAL = """
abasourdir jaillir rejaillir resurgir assoupir dégrossir glapir aigrir
""".split()

NOUNS_DERIVED = """
lavage nettoyage repassage bricolage jardinage arrosage élagage
ramonage recyclage compostage rangement déménagement emménagement
aménagement déroulement enroulement gonflement dégonflement
froissement craquement claquement grincement sifflement ronflement
bourdonnement vrombissement gazouillis cliquetis gargouillis hachis
roulis tangage chavirement naufrage abordage accostage amarrage
remorquage pilotage atterrissage décollage amerrissage survol envol
essor formation déformation information0 réforme transformation
création récréation construction reconstruction instruction traduction
production reproduction introduction réduction séduction déduction
conduite cuisson punition récompense félicitation encouragement
enseignement0 éducation scolarisation révision rédaction dissertation
récitation mémorisation correction notation vaccination anesthésie
transfusion perfusion intubation suture internement radiographie
inoculation contamination infection immunisation guérison
cicatrisation rééducation hospitalisation consultation auscultation
amputation greffe plantation moisson récolte vendange semis labour
fauchage irrigation drainage fertilisation maçonnerie menuiserie
plomberie toiture isolation ventilation climatisation chauffage
éclairage navigation croisière mouillage célébration bénédiction
communion prière sermon prêche baptême procession pèlerinage
négociation facturation comptabilité fiscalité imposition taxation
exonération fraude escroquerie extorsion détournement blanchiment
arrestation incarcération détention libération acquittement
condamnation plaidoirie réquisitoire verdict sentence procès tribunal
barreau magistrature chant couture tricot tissage filage teinture
dégustation jeûne souper0 maquillage démaquillage épilation manucure
coiffure0 brossage tressage rasage massage tatouage bronzage
communication0 conversation0 dialogue argumentation objection
murmure chuchotement bégaiement monologue commérage cancan
épargne placement investissement spéculation remboursement emprunt0
endettement liquidation cotisation amortissement dévaluation
réévaluation indexation plafonnement
""".split()

# nouns whose graphs common verbs would otherwise claim (the stated
# noun-first priority only works if the noun is listed — review r5c)
NOUNS_HOMOGRAPH = """
glace planche paille poste teint teinte atteinte feinte étreinte
empreinte contrainte plainte joint enduit réduit produit lobe plaque
zeste nappe braise poche germe couronne cire dose pompe sonde suicide
commère banquette peine mine niche bride souffle valse voile vrille
zone tresse tasse prime tranche pointe marque touche gifle lime cale
grille rature rafle trempe
""".split()
